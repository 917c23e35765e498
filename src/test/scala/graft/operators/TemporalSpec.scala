package graft.operators

import graft.SparkSpec

class TemporalSpec extends SparkSpec {

  import spark.implicits._

  test("asof: greatest right ts <= left ts, ties inclusive, no match -> null") {
    val right = Seq((1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0),
      (2L, 500L, 20L, 5.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val left = Seq((1L, 150L, 91L, 0.0), (1L, 200L, 92L, 0.0),
      (1L, 50L, 93L, 0.0), (2L, 600L, 94L, 0.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val got = Temporal.asofJoin(left, right)
      .select("event_id", "matched_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(91L) === Some(10L)) // 100 <= 150 < 200
    assert(got(92L) === Some(11L)) // tie: 200 <= 200 inclusive
    assert(got(93L) === None)      // nothing at or before 50
    assert(got(94L) === Some(20L)) // per-key isolation
  }

  test("range join: bucket-straddling pairs and reverse-time pairs found") {
    val w = 100L
    // ids ordered against time on purpose: pair (1,2) has 2 EARLIER
    val ev = Seq((1L, 1L, 250L), (2L, 1L, 160L), // straddles buckets 1|2, Δ=90
      (3L, 1L, 400L),                            // Δ=150 from 1 → out
      (4L, 2L, 250L))                            // other user
      .map { case (e, u, t) => (e, u, t) }
      .toDF("event_id", "user_id", "ts_us")
    val got = Temporal.rangeJoinPairs(ev, w)
      .select("i", "j", "delta_us").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 90L)))
  }

  test("sessionize: gap starts new session; stats per session") {
    val gap = 1000L
    val ev = Seq((1L, 0L, 1L), (1L, 500L, 2L), (1L, 900L, 3L),
      (1L, 5000L, 4L), (2L, 0L, 5L))
      .map { case (u, t, e) => (e, u, t) }
      .toDF("event_id", "user_id", "ts_us")
    val got = Temporal.sessionize(ev, gap)
      .select("user_id", "session_id", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 1L, 3L, 900L), // events at 0,500,900
      (1L, 2L, 1L, 0L),   // 5000 after >1000 gap
      (2L, 1L, 1L, 0L)))
  }

  test("scd2: runs collapse to intervals; last interval open and current") {
    val ev = Seq( // user 1: view,view,cart,view — 3 runs; user 2: one run
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "view"),
      (3L, 1L, 300L, "cart"), (4L, 1L, 400L, "view"),
      (5L, 2L, 100L, "cart"))
      .map { case (e, u, t, ty) => (e, u, t, ty) }
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Temporal.scd2Build(ev)
      .select("user_id", "version", "event_type", "valid_from_us",
        "valid_to_us", "n_obs", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Int)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 1L, "view", 100L, Some(300L), 2L, 0),
      (1L, 2L, "cart", 300L, Some(400L), 1L, 0),
      (1L, 3L, "view", 400L, None, 1L, 1),
      (2L, 1L, "cart", 100L, None, 1L, 1)))
    // intervals tile: every historical row's valid_to = next valid_from
    // (asserted literally above) and exactly one open row per user
    assert(got.count(_._7 == 1) === 2)
  }

  test("resample: open/close by time order, micro-exact volume") {
    val ev = Seq( // one series, bucket width 100: bucket 0 = ts 0-99
      (1L, "view", 10L, 5.5), (2L, "view", 90L, 1.25),
      (3L, "view", 50L, 9.0), (4L, "view", 150L, 2.0))
      .toDF("event_id", "event_type", "ts_us", "value")
    val got = Temporal.resampleOhlc(ev, 100L)
      .select("bucket_start_us", "n", "open", "close", "high", "low", "vol")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 3L, 5.5, 1.25, 9.0, 1.25, 15.75), // open@10, close@90
      (100L, 1L, 2.0, 2.0, 2.0, 2.0, 2.0)))
  }

  test("gap fill: dense axis with zero rows for empty buckets") {
    val ev = Seq(
      (1L, "a", 50L, 1.0), (2L, "a", 350L, 2.0), (3L, "b", 150L, 4.0))
      .toDF("event_id", "event_type", "ts_us", "value")
    val got = Temporal.gapFill(ev, 100L)
      .select("event_type", "bucket_start_us", "n", "vol")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // global bounds are buckets 0..3 for BOTH series
    assert(got.length === 8)
    assert(got.filter(_._1 == "a").map(_._3).toSeq === Seq(1L, 0L, 0L, 1L))
    assert(got.filter(_._1 == "b").map(_._3).toSeq === Seq(0L, 1L, 0L, 0L))
    assert(got.filter(r => r._3 == 0).forall(_._4 == 0.0))
  }

  test("scd2 lookup: fact joins the version valid at its timestamp") {
    // dim history for user 1: A @[10,30), B @[30,∞)
    val dimEvents = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "A"), (3L, 1L, 30L, "B"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val dim = Temporal.scd2Build(dimEvents)
    val facts = Seq(
      (10L, 1L, 5L),   // before any version -> NULL state
      (11L, 1L, 15L),  // inside A
      (12L, 1L, 30L),  // boundary: belongs to B (valid_from inclusive)
      (13L, 1L, 99L),  // open current interval -> B
      (14L, 2L, 50L))  // unknown user -> NULL state
      .toDF("event_id", "user_id", "ts_us")
    val got = Temporal.scd2Lookup(facts, dim)
      .select("event_id", "state_at_ts").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(10L -> None, 11L -> Some("A"), 12L -> Some("B"),
      13L -> Some("B"), 14L -> None))
  }

  test("asof tolerance: stale matches null out and flag; fresh pass through") {
    val left = Seq((10L, 1L, 1000L, 5.0), (11L, 2L, 9000L, 7.0),
      (12L, 3L, 500L, 9.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val right = Seq((1L, 1L, 900L, 1.0), (2L, 2L, 100L, 2.0))
      .toDF("event_id", "user_id", "ts_us", "value")
    val got = Temporal.asofJoinTol(left, right, tolUs = 1000L)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double], Long)]
      .collect().map(r => r._1 -> r).toMap
    // user 1: match at 900, age 100 <= tol -> kept, not expired
    assert(got(10L) === ((10L, 1L, 1000L, Some(1L), Some(900L),
      Some(1.0), 0L)))
    // user 2: match at 100, age 8900 > tol -> nulled AND flagged
    assert(got(11L) === ((11L, 2L, 9000L, None, None, None, 1L)))
    // user 3: no match at all -> nulls, NOT flagged as expired
    assert(got(12L) === ((12L, 3L, 500L, None, None, None, 0L)))
  }

  test("scd2 merge: equals the full rebuild at every cutoff") {
    // archetypes: user 1 continues its type across the boundary,
    // user 2 changes type there, user 3 exists only in the base,
    // user 4 only in the delta, user 5 flips types repeatedly
    val e = Seq(
      (1L, 1L, 100L, "A"), (2L, 1L, 300L, "A"),
      (3L, 1L, 500L, "A"), (4L, 1L, 700L, "B"),
      (5L, 2L, 100L, "X"), (6L, 2L, 600L, "Y"),
      (7L, 3L, 150L, "C"),
      (8L, 4L, 650L, "D"),
      (9L, 5L, 100L, "P"), (10L, 5L, 200L, "Q"),
      (11L, 5L, 550L, "P"), (12L, 5L, 800L, "Q"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val full = Temporal.scd2Build(e)
      .orderBy("user_id", "version").collect().toSeq
    // includes the degenerate cutoffs: empty base and empty delta
    for (cut <- Seq(0L, 120L, 400L, 520L, 640L, 900L)) {
      val merged = Temporal.scd2Merge(
        Temporal.scd2Build(e.filter($"ts_us" < cut)),
        e.filter($"ts_us" >= cut))
        .orderBy("user_id", "version").collect().toSeq
      assert(merged === full, s"cutoff $cut diverged from the rebuild")
    }
  }

  test("rolling z: flat window flags any deviation; exact 3-sigma rule") {
    def mk(tp: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, b) => (0 until c).map(i => (tp, b.toLong * 1000L + i))
    }
    val df = (mk("flat", Seq(2, 2, 2, 2, 8)) ++
      mk("noisy", Seq(1, 2, 1, 2, 2, 9))).toDF("event_type", "ts_us")
    val got = Temporal.rollingAnomaly(df, bucketUs = 1000L, w = 4)
      .as[(String, Long, Long, Option[Double], Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // warm-up buckets (fewer than w trailing points) emit nothing
    assert(got.keySet === Set(("flat", 4000L), ("noisy", 4000L),
      ("noisy", 5000L)))
    // flat window [2,2,2,2]: sigma 0 -> any deviation flags, z is null
    assert(got(("flat", 4000L)) === (("flat", 4000L, 8L, None, 1L)))
    // noisy bucket 4, window [1,2,1,2]: num=2, varw=4 -> z=1.0, no flag
    assert(got(("noisy", 4000L)) === (("noisy", 4000L, 2L, Some(1.0), 0L)))
    // noisy bucket 5, window [2,1,2,2]: num=29, varw=3 -> 841 >= 27
    val r5 = got(("noisy", 5000L))
    assert(r5._5 === 1L && r5._4.get > 16.0)
  }

  test("cusum: sustained shift accumulates to the alarm; dips clamp at 0") {
    def mk(tp: String, atN: Seq[(Long, Int)]) = atN.flatMap {
      case (b, c) => (0 until c).map(i => (tp, b * 1000L + i))
    }
    // "shift": flat n=2 over buckets 0..9 (the reference half:
    // mid=(0+19) div 2=9 -> refn=10, refs=20, slack=10), then n=5
    // from bucket 10. y = 10n-30: flat -10/bucket, shifted +20.
    // cusum climbs 20/bucket from 10; threshold 5*refs=100 -> first
    // alarm at bucket 15 (cusum 120).
    // "flat": constant series never alarms and clamps at 0
    // (y = 3*5-15-7 = -7 < 0 every bucket).
    val df = (mk("shift", (0L to 9L).map(_ -> 2) ++ (10L to 19L).map(_ -> 5))
      ++ mk("flat", (0L to 9L).map(_ -> 3)))
      .toDF("event_type", "ts_us")
    val got = Temporal.cusumShift(df, bucketUs = 1000L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2 / 1000L) -> r).toMap
    assert(got.size === 30)
    assert((0L to 9L).forall(b => got(("flat", b))._4 == 0L))
    assert(got.filter(_._1._1 == "flat").values.forall(_._5 == 0L))
    // reference half of "shift" sits at 0 too (monotone-down cs)
    assert((0L to 9L).forall(b => got(("shift", b))._4 == 0L))
    assert(got(("shift", 10L))._4 === 20L)
    assert(got(("shift", 14L)) === (("shift", 14000L, 5L, 100L, 0L)))
    assert(got(("shift", 15L)) === (("shift", 15000L, 5L, 120L, 1L)))
    assert(got(("shift", 19L))._5 === 1L) // alarm LATCHES while high
  }

  test("decompose: perfect weekly pattern leaves zero residuals") {
    val dayUs = Temporal.DayUs
    // 21 days, n(d) = 10 + (d mod 7): a pure trend+season series
    val df = (0 until 21).flatMap { d =>
      (0 until 10 + d % 7).map(i => ("a", d * dayUs + i))
    }.toDF("event_type", "ts_us")
    val got = Temporal.decompose(df)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._2 / dayUs -> r).toMap
    assert(got.size === 21)
    // edge days (incomplete centered window) stay null
    Seq(0L, 1L, 2L, 18L, 19L, 20L).foreach { d =>
      assert(got(d)._4.isEmpty && got(d)._5.isEmpty && got(d)._6.isEmpty)
    }
    // interior: trend is the exact week mean 13.000, the seasonal
    // component recovers (dow-3)*1000, and residuals vanish
    (3L to 17L).foreach { d =>
      val r = got(d)
      assert(r._3 === 10L + d % 7)
      assert(r._4 === Some(13000L), s"day $d trend")
      assert(r._5 === Some((d % 7 - 3) * 1000L), s"day $d seasonal")
      assert(r._6 === Some(0L), s"day $d residual")
    }
  }

  test("ewma: hand-computed kernel sums, adaptive warm-up, gap skipped") {
    def mk(tp: String, atN: Seq[(Long, Int)]) = atN.flatMap {
      case (b, c) => (0 until c).map(_ => (tp, b))
    }
    // buckets 0 (n=2), 1 (n=4), 3 (n=8); bucket 2 is a gap
    val df = mk("a", Seq((0L, 2), (1L, 4), (3L, 8)))
      .toDF("event_type", "ts_us")
    val got = Temporal.ewmaSmooth(df, bucketUs = 1L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    // only observed buckets emit — the gap bucket 2 is absent
    assert(got.keySet === Set(0L, 1L, 3L))
    // K=8 kernel weights 2^(7-age): bucket 0 alone -> exact mean
    assert(got(0L) === (("a", 0L, 2L, 2000L)))
    // bucket 1: (4*128 + 2*64)*1000 div (128+64) = 640000 div 192
    assert(got(1L) === (("a", 1L, 4L, 3333L)))
    // bucket 3: ages 0,2,3 -> (8*128+4*32+2*16)*1000 div 176
    assert(got(3L) === (("a", 3L, 8L, 6727L)))
  }
}
