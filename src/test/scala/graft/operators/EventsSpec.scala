package graft.operators

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "user_id", "ts_us", "event_type")

  private def evv(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")

  test("fill forward: error rows take the last valid value, leading stay null") {
    val got = Events.fillForward(evv(
      (1L, 1L, 10L, "error", 0.0),  // before any valid -> null
      (2L, 1L, 20L, "view", 5.0),
      (3L, 1L, 30L, "error", 0.0),  // -> 5.0
      (4L, 1L, 40L, "click", 7.0),
      (5L, 1L, 50L, "error", 0.0))) // -> 7.0 (latest wins)
      .select("event_id", "filled_value", "was_imputed")
      .as[(Long, Option[Double], Int)].collect()
      .map { case (k, v, f) => k -> ((v, f)) }.toMap
    assert(got(1L) === ((None, 0)))
    assert(got(2L) === ((Some(5.0), 0)))
    assert(got(3L) === ((Some(5.0), 1)))
    assert(got(5L) === ((Some(7.0), 1)))
  }

  test("new vs returning: a user is new only on their first-seen day") {
    val dayUs = 86400L * 1000000
    val ev = Seq(
      (1L, 0L), (1L, dayUs),        // user 1: day 0 new, day 1 returning
      (2L, dayUs), (2L, dayUs + 1)) // user 2: day 1 new (dup row collapses)
      .toDF("user_id", "ts_us")
    val got = Events.newVsReturning(ev)
      .select("active", "new_users", "returning")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L, 0L), (2L, 1L, 1L)))
  }

  test("attribution: purchase credits the last prior non-purchase channel") {
    val got = Events.attribution(evv(
      (1L, 1L, 10L, "view", 0.0), (2L, 1L, 20L, "purchase", 10.0),
      (3L, 1L, 30L, "click", 0.0), (4L, 1L, 40L, "purchase", 20.0),
      // user 2 purchases with no prior event -> direct
      (5L, 2L, 10L, "purchase", 5.0),
      // a purchase between purchases still credits the older channel
      (6L, 1L, 50L, "purchase", 1.0)))
      .select("channel", "n_purchases", "revenue")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("view") === ((1L, 10.0)))
    assert(got("click") === ((2L, 21.0))) // events 4 and 6
    assert(got("direct") === ((1L, 5.0)))
  }

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
    val got = Events.heavyHittersCms(ev(rows: _*),
      Seq("view", "click", "purchase", "refund"), eps = 0.01)
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

  test("key skew: hot key ranks first with exact ppm share and x-mean") {
    // user 1: 50 events, users 2..11: 1 each -> 60 rows over 11 keys
    val rows = (1 to 50).map(i => (i.toLong, 1L)) ++
      (2 to 11).map(u => (100L + u, u.toLong))
    val df = rows.toDF("event_id", "user_id")
    val got = Events.keySkew(df, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.length === 3)
    // share = round(50e6/60) = 833333; x_mean = round(50*11e6/60) = 9166667
    assert(got.head === ((1L, 50L, 833333L, 9166667L)))
    // singleton keys: share round(1e6/60)=16667, x_mean round(11e6/60)=183333
    assert(got(1) === ((2L, 1L, 16667L, 183333L)))
    assert(got(2) === ((3L, 1L, 16667L, 183333L))) // tie broken by user_id
  }

  test("freshness: lag vs the freshest type in whole minutes, SLA flag") {
    val us = 60000000L // one minute
    val df = Seq(
      (1L, 1L, 100L * us, "a"), (2L, 1L, 50L * us, "a"),
      (3L, 2L, 20L * us, "b"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.freshness(df)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 2L, 100L * us, 0L, 0L)))
    assert(got("b") === (("b", 1L, 20L * us, 80L, 1L))) // 80 min > 60 SLA
  }

  test("top paths: first three of each gap session, short sessions keep short paths") {
    val df = Seq(
      (1L, 1L, 1000L, "view"), (2L, 1L, 2000L, "click"),
      (3L, 1L, 3000L, "purchase"), (4L, 1L, 4000L, "view"), // 4th drops
      (5L, 2L, 1000L, "view"),
      (6L, 2L, 100000L, "click")) // past the gap: its own session
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Events.topSessionPaths(df, gapUs = 10000L)
      .as[(String, Long)].collect().toSeq
    // counts tie at 1 -> path ascending breaks the order
    assert(got === Seq(("click", 1L), ("view", 1L),
      ("view>click>purchase", 1L)))
  }

  test("jsonProps: typed extraction from the props JSON") {
    val df = Seq((1L, "view", """{"k": 42}"""), (2L, "click", """{"j": 1}"""))
      .toDF("event_id", "event_type", "props")
    val got = Events.jsonProps(df)
      .select("event_id", "k_val").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(42L))
    assert(got(2L) === None) // key absent -> null, not error
  }

  test("conversion latency: first-view anchor, discrete quartiles exact") {
    val min = 60000000L
    val e = ev(
      (1L, 1L, 0L, "view"), (2L, 1L, 2 * min, "purchase"),
      (3L, 2L, 0L, "view"), (4L, 2L, 60 * min, "purchase"),
      (5L, 3L, 0L, "view"), // never converts
      // u4: a purchase BEFORE the first view must not count
      (6L, 4L, 0L, "purchase"), (7L, 4L, 100L, "view"),
      (8L, 4L, 100L + min, "purchase"))
    val got = Events.conversionLatency(e)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    // latencies {2, 60, 1} min (u4's anchor is its post-view buy,
    // one minute after the first view); sorted [1,2,60]:
    // p25 -> 1 (cum 1*4 >= 3), p50 -> 2 (cum 2*2 >= 3), p75 -> 60
    assert(got === ((4L, 3L, Some(1L), Some(2L), Some(60L))))
    // no purchases at all: count row survives with null quartiles
    val none = Events.conversionLatency(ev((1L, 1L, 0L, "view")))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    assert(none === ((1L, 0L, None, None, None)))
  }

  test("covisitation: session pairs, repeat dedup, cap keeps first-seen") {
    def row(e: Long, u: Long, t: Long, item: Long) =
      (e, u, t, s"""{"k": $item}""")
    val e = Seq(
      // u1 session A: items 1,2,3 (+ a repeat of 1 — dedups)
      row(1, 1, 0, 1), row(2, 1, 10, 2), row(3, 1, 20, 3), row(4, 1, 25, 1),
      // u1 session B (gap > 1000): items 1,2 again
      row(5, 1, 5000, 1), row(6, 1, 5010, 2),
      // u2 one session: items 2,3
      row(7, 2, 0, 2), row(8, 2, 10, 3),
      // u3: three items under cap=2 -> only first-seen (9, 8) pair
      row(9, 3, 0, 9), row(10, 3, 1, 8), row(11, 3, 2, 7))
      .toDF("event_id", "user_id", "ts_us", "props")
    val got = Events.covisitation(e, gapUs = 1000L, cap = 2, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    // cap=2 also trims u1 session A to items {1,2} (first-seen order)
    // pair counts: (1,2)=2, (2,3)=1, (8,9)=1
    assert(got === Set(
      (1L, 2L, 2L, 1L), (2L, 1L, 2L, 1L), (2L, 3L, 1L, 2L),
      (3L, 2L, 1L, 1L), (8L, 9L, 1L, 1L), (9L, 8L, 1L, 1L)))
    // wider cap admits the full session-A triangle
    val wide = Events.covisitation(e, gapUs = 1000L, cap = 32, k = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(wide((1L, 3L)) === 1L && wide((2L, 3L)) === 2L
      && wide((1L, 2L)) === 2L && wide((7L, 8L)) === 1L)
  }
}
