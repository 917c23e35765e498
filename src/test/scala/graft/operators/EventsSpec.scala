package graft.operators

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts_us", "event_type")

  test("funnel: converts only when view -> click -> purchase in window") {
    val w = 100L
    val df = Events.funnel(ev(
      // user 1: full chain inside the window -> converts
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "purchase"),
      // user 2: click but never a view -> no conversion
      (4L, 2L, 10L, "click"), (5L, 2L, 20L, "purchase"),
      // user 3: view too old (p - v > w) -> no conversion
      (6L, 3L, 0L, "view"), (7L, 3L, 90L, "click"), (8L, 3L, 150L, "purchase"),
      // user 4: click before view (wrong order) -> no conversion
      (9L, 4L, 10L, "click"), (10L, 4L, 20L, "view"), (11L, 4L, 30L, "purchase")),
      windowUs = w)
      .select("user_id", "n_purchases", "n_converted")
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, c) => u -> ((n, c)) }.toMap
    assert(df(1L) === ((1L, 1L)))
    assert(df(2L) === ((1L, 0L)))
    assert(df(3L) === ((1L, 0L)))
    assert(df(4L) === ((1L, 0L)))
  }

  test("funnel: newest click dominates — an older in-window chain still counts") {
    val w = 100L
    // newest click at 80 has a valid view at 70; purchase at 90
    // converts even though an even older click at 20 exists
    val df = Events.funnel(ev(
      (1L, 1L, 20L, "click"), (2L, 1L, 70L, "view"),
      (3L, 1L, 80L, "click"), (4L, 1L, 90L, "purchase")), windowUs = w)
      .select("n_converted").as[Long].collect()
    assert(df.toSeq === Seq(1L))
  }

  test("funnel: per-purchase evaluation, rate rounded") {
    val w = 50L
    val df = Events.funnel(ev(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"),
      (3L, 1L, 30L, "purchase"),   // converts
      (4L, 1L, 300L, "purchase")), // stale chain -> not converted
      windowUs = w)
      .select("n_purchases", "n_converted", "conv_rate")
      .as[(Long, Long, Double)].collect()
    assert(df.toSeq === Seq((2L, 1L, 0.5)))
  }

  test("CMS heavy hitters: estimates overcount-bounded, top-1 exact") {
    // skewed stream: 600 views, 250 clicks, 100 purchases, 50 refunds
    val rows = (1L to 1000L).map { i =>
      val t = if (i <= 600) "view" else if (i <= 850) "click"
      else if (i <= 950) "purchase" else "refund"
      (i, i % 7, i, t)
    }
    val got = Events.heavyHittersCms(ev(rows: _*), eps = 0.01)
      .as[(String, Long)].collect()
    val exact = Map("view" -> 600L, "click" -> 250L,
      "purchase" -> 100L, "refund" -> 50L)
    got.foreach { case (t, est) =>
      assert(est >= exact(t), s"$t undercounted: $est < ${exact(t)}")
      assert(est <= exact(t) + math.ceil(0.01 * 1000).toLong,
        s"$t above the eps*N bound: $est")
    }
    assert(got.head._1 === "view") // heavy hitter ranks first
  }

  test("jsonProps: typed extraction from the props JSON") {
    val df = Seq((1L, "view", """{"k": 42}"""), (2L, "click", """{"j": 1}"""))
      .toDF("event_id", "event_type", "props")
    val got = Events.jsonProps(df)
      .select("event_id", "k_val").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(42L))
    assert(got(2L) === None) // key absent -> null, not error
  }
}
