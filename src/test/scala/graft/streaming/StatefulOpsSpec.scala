package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState semantics: state carries ACROSS
  * micro-batches, alerts are edge-triggered per tier.
  */
class StatefulOpsSpec extends SparkSpec {

  import spark.implicits._

  test("spend tiers: running state across two micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[OrderEvent]
    val q = StatefulOps.spendTiers(in.toDS())
      .writeStream.format("memory").queryName("tiers_out")
      .outputMode("append").start()

    // batch 1: C1 reaches SILVER (12k); C2 stays below (4k)
    in.addData(OrderEvent("C1", 8000.0), OrderEvent("C1", 4000.0),
      OrderEvent("C2", 4000.0))
    q.processAllAvailable()
    // batch 2: C1 crosses GOLD with accumulated state; C2 crosses SILVER
    in.addData(OrderEvent("C1", 45000.0), OrderEvent("C2", 7000.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tiers_out")
      .as[TierAlert].collect().sortBy(a => (a.customer_id, a.n_orders))
    assert(got.map(a => (a.customer_id, a.tier, a.n_orders)).toSeq === Seq(
      ("C1", "SILVER", 2L), ("C1", "GOLD", 3L), ("C2", "SILVER", 2L)))
    // state accumulated across batches, not per batch
    assert(got.find(a => a.customer_id == "C1" && a.tier == "GOLD")
      .get.total_spent === 57000.0)
  }

  test("spend tiers run on the RocksDB state store provider") {
    // the production state backend at scale (bounded JVM heap, state
    // spills to local disk); prove the same query runs on it
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[OrderEvent]
      val q = StatefulOps.spendTiers(in.toDS())
        .writeStream.format("memory").queryName("tiers_rocks")
        .outputMode("append").start()
      in.addData(OrderEvent("C9", 60000.0))
      q.processAllAvailable()
      in.addData(OrderEvent("C9", 50000.0)) // second batch: state read back
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tiers_rocks").as[TierAlert].collect()
        .sortBy(_.n_orders).map(a => (a.tier, a.total_spent)).toSeq
      assert(got === Seq(("GOLD", 60000.0), ("PLATINUM", 110000.0)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState: same tier semantics on the new typed-state API") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState runs only on RocksDB (enforced by Spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[OrderEvent]
      val q = StatefulOps.spendTiersTws(in.toDS())
        .writeStream.format("memory").queryName("tiers_tws")
        .outputMode("append").start()
      in.addData(OrderEvent("C1", 8000.0), OrderEvent("C1", 4000.0),
        OrderEvent("C2", 4000.0))
      q.processAllAvailable()
      in.addData(OrderEvent("C1", 45000.0), OrderEvent("C2", 7000.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("tiers_tws")
        .as[TierAlert].collect().sortBy(a => (a.customer_id, a.n_orders))
      // identical output to the flatMapGroupsWithState path
      assert(got.map(a => (a.customer_id, a.tier, a.n_orders)).toSeq === Seq(
        ("C1", "SILVER", 2L), ("C1", "GOLD", 3L), ("C2", "SILVER", 2L)))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transition counts: MapState accumulates, sequences chain across batches") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TypedEvent]
      val q = StatefulOps.transitionCounts(in.toDS())
        .writeStream.format("memory").queryName("trans_out")
        .outputMode("append").start()
      // batch 1 (out of order on purpose — handler sorts by ts):
      // u1 view@1 → click@2; u2 lone view (no transition yet)
      in.addData(TypedEvent(2L, 1L, 2000L, "click"),
        TypedEvent(1L, 1L, 1000L, "view"),
        TypedEvent(3L, 2L, 1000L, "view"))
      q.processAllAvailable()
      // batch 2: u1's purchase chains to batch 1's last event (click);
      // u2's click chains to its batch-1 view; u1 repeats view→click
      in.addData(TypedEvent(4L, 1L, 3000L, "purchase"),
        TypedEvent(5L, 2L, 2000L, "click"),
        TypedEvent(6L, 1L, 4000L, "view"),
        TypedEvent(7L, 1L, 5000L, "click"))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("trans_out").as[TransitionCount].collect()
      val b1 = got.filter(t => t.user_id == 1L)
      assert(b1.map(t => (t.prev_type, t.next_type, t.n)).toSet === Set(
        ("view", "click", 1L),       // batch 1
        ("click", "purchase", 1L),   // cross-batch chain
        ("purchase", "view", 1L),
        ("view", "click", 2L)))      // running count grew in batch 2
      assert(got.filter(_.user_id == 2L)
        .map(t => (t.prev_type, t.next_type, t.n)).toSeq ===
        Seq(("view", "click", 1L)))  // cross-batch only
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming scd2: runs chain across batches, closes emit once") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TypedEvent]
      val q = StatefulOps.scd2Stream(in.toDS())
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode("append").start()
      // batch 1: u1 view,view,cart (closes the view run in-batch);
      // u2 opens a view run that stays open
      in.addData(TypedEvent(2L, 1L, 200L, "view"),
        TypedEvent(1L, 1L, 100L, "view"),
        TypedEvent(3L, 1L, 300L, "cart"),
        TypedEvent(4L, 2L, 100L, "view"))
      q.processAllAvailable()
      val afterB1 = spark.table("scd2_out").as[Scd2Interval].collect()
      assert(afterB1.toSet === Set(
        Scd2Interval(1L, 1L, "view", 100L, 300L, 2L)))
      // batch 2: u1's view@400 closes the cart run opened in batch 1;
      // u2's view@200 EXTENDS its open run (same type across the
      // boundary — must NOT close), then cart@300 closes it with n=2.
      // u1's straggler purchase@50 is OLDER than the open run — the
      // ordering contract drops it (no inverted interval, no version)
      in.addData(TypedEvent(5L, 1L, 400L, "view"),
        TypedEvent(6L, 2L, 200L, "view"),
        TypedEvent(7L, 2L, 300L, "cart"),
        TypedEvent(8L, 1L, 50L, "purchase"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("scd2_out").as[Scd2Interval].collect()
      assert(got.toSet === Set(
        Scd2Interval(1L, 1L, "view", 100L, 300L, 2L),
        Scd2Interval(1L, 2L, "cart", 300L, 400L, 1L),
        Scd2Interval(2L, 1L, "view", 100L, 300L, 2L)))
      // the open runs (u1 view@400, u2 cart@300) are in state, not
      // the sink — append-mode rows are all FINAL intervals
      assert(!got.exists(i => i.valid_from_us == 400L || (i.user_id == 2L
        && i.event_type == "cart")))
      // the dropped straggler left no trace and no interval inverted
      assert(!got.exists(_.event_type == "purchase"))
      assert(got.forall(i => i.valid_to_us > i.valid_from_us))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("tier function boundaries") {
    assert(StatefulOps.tierOf(9999.99).isEmpty)
    assert(StatefulOps.tierOf(10000.0).contains("SILVER"))
    assert(StatefulOps.tierOf(100000.0).contains("PLATINUM"))
  }

  test("streaming anomaly: trail carries across batches, matches the batch twin") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the TemporalSpec "noisy" series [1,2,1,2,2,9] at bucketUs=1000,
      // w=4, split mid-series so the trail must cross the batch boundary;
      // bucket 6 is the sentinel that closes bucket 5 and stays open
      def rows(counts: Seq[(Int, Int)]) = counts.flatMap { case (b, c) =>
        (0 until c).map(i => BucketEvent("noisy", b.toLong * 1000L + i))
      }
      val b1 = rows(Seq(0 -> 1, 1 -> 2, 2 -> 1))
      val b2 = rows(Seq(3 -> 2, 4 -> 2, 5 -> 9, 6 -> 1))
      val in = MemoryStream[BucketEvent]
      val q = StatefulOps.anomalyStream(in.toDS(), bucketUs = 1000L, w = 4)
        .writeStream.format("memory").queryName("anom_out")
        .outputMode("append").start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("anom_out").as[AnomalyFlag].collect()
        .map(f => f.bucket_start_us -> f).toMap
      assert(got.keySet === Set(4000L, 5000L))
      assert(got(4000L) === AnomalyFlag("noisy", 4000L, 2L, Some(1.0), 0L))
      assert(got(5000L).is_anomaly === 1L)
      // one codepath: the batch operator over the same rows (minus the
      // never-closed sentinel bucket) emits identical rows
      val batch = graft.operators.Temporal.rollingAnomaly(
        (b1 ++ b2).filter(_.ts_us < 6000L).toDF(),
        bucketUs = 1000L, w = 4)
        .as[(String, Long, Long, Option[Double], Long)].collect().toSet
      val streamSet = got.values
        .map(f => (f.event_type, f.bucket_start_us, f.n, f.z, f.is_anomaly))
        .toSet
      assert(batch === streamSet)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming cusum: two-long carry crosses batches, matches the batch twin") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the TemporalSpec "shift" series: flat n=2 buckets 0..9, n=5
      // from 10..19 (ref half: refn=10, refs=20 — exactly what the
      // batch midpoint trainer derives); bucket 20 is the sentinel
      // that closes 19 and stays open. Split mid-shift so the carry
      // crosses the batch boundary.
      def rows(counts: Seq[(Int, Int)]) = counts.flatMap { case (b, c) =>
        (0 until c).map(i => BucketEvent("shift", b.toLong * 1000L + i))
      }
      val b1 = rows((0 to 9).map(_ -> 2) ++ Seq(10 -> 5, 11 -> 5))
      val b2 = rows((12 to 19).map(_ -> 5) ++ Seq(20 -> 1))
      val in = MemoryStream[BucketEvent]
      val q = StatefulOps.cusumStream(in.toDS(), refn = 10L, refs = 20L,
          bucketUs = 1000L)
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("append").start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("cusum_out").as[CusumFlag].collect()
        .map(f => f.bucket_start_us -> f).toMap
      // every bucket but the open sentinel scored
      assert(got.keySet === (0L to 19L).map(_ * 1000L).toSet)
      assert(got(14000L) === CusumFlag("shift", 14000L, 5L, 100L, 0L))
      assert(got(15000L) === CusumFlag("shift", 15000L, 5L, 120L, 1L))
      // one recurrence: the batch operator over the same closed rows
      // (its midpoint trainer re-derives refn=10, refs=20) emits
      // identical rows
      val batch = graft.operators.Temporal.cusumShift(
        (b1 ++ b2).filter(_.ts_us < 20000L).toDF(), bucketUs = 1000L)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val streamSet = got.values
        .map(f => (f.event_type, f.bucket_start_us, f.n, f.cusum,
          f.is_alarm)).toSet
      assert(batch === streamSet)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming attribution: channel chains across batches, matches batch op") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val b1 = Seq(
        ValuedEvent(1L, 1L, 100L, "view", 0.0),
        ValuedEvent(2L, 1L, 200L, "purchase", 10.0), // -> view
        ValuedEvent(3L, 2L, 100L, "purchase", 5.0))  // -> direct
      val b2 = Seq(
        ValuedEvent(4L, 1L, 300L, "purchase", 20.0), // batch-1 view carries
        ValuedEvent(5L, 1L, 400L, "click", 0.0),
        ValuedEvent(6L, 1L, 500L, "purchase", 1.0),  // -> click
        ValuedEvent(7L, 2L, 50L, "view", 0.0),       // straggler: dropped
        ValuedEvent(9L, 2L, 40L, "purchase", 7.0))   // late purchase -> 'late'
      // batch 3 PROVES the straggler was dropped: were view@50 applied,
      // this purchase would credit "view"; emitted history says direct
      val b3 = Seq(ValuedEvent(8L, 2L, 200L, "purchase", 2.0))
      val in = MemoryStream[ValuedEvent]
      val q = StatefulOps.attributionStream(in.toDS())
        .writeStream.format("memory").queryName("attr_out")
        .outputMode("append").start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
      q.stop()
      val got = spark.table("attr_out").as[AttributedPurchase].collect()
        .map(a => a.event_id -> a.channel).toMap
      assert(got === Map(2L -> "view", 3L -> "direct",
        4L -> "view", 6L -> "click", 8L -> "direct", 9L -> "late"))
      // one codepath: the batch operator over the concatenated input
      // (minus the dropped straggler) agrees channel-for-channel
      val batch = graft.operators.Events.attribution(
        (b1 ++ b2.filterNot(e => e.event_id == 7L || e.event_id == 9L) ++ b3)
          .toDF("event_id", "user_id", "ts_us", "event_type", "value"))
        .select("channel", "n_purchases").as[(String, Long)]
        .collect().toMap
      // late rows carry the sentinel, outside the batch twin's universe
      val streamByCh = spark.table("attr_out").as[AttributedPurchase]
        .collect().filter(_.channel != "late")
        .groupBy(_.channel).view.mapValues(_.length.toLong).toMap
      assert(batch === streamByCh)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("trending top-k: counts chain across batches, shard merge is exact") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[ItemHit]
      val q = StatefulOps.trendingTopK(in.toDS(), k = 2, nBuckets = 2)
        .writeStream.format("memory").queryName("trend_out")
        .outputMode("append").start()
      def hits(ids: Long*) = in.addData(ids.map(ItemHit(_)))
      // batch 1: even shard {10:2, 12:1}, odd shard {11:1}
      hits(10L, 10L, 12L, 11L)
      q.processAllAvailable()
      val b1 = spark.table("trend_out").as[TrendingItem].collect()
      assert(b1.filter(_.bucket == 0L).map(t => (t.item_id, t.n_total, t.rank))
        .sortBy(_._3).toSeq === Seq((10L, 2L, 1), (12L, 1L, 2)))
      assert(b1.filter(_.bucket == 1L).map(t => (t.item_id, t.n_total, t.rank))
        .toSeq === Seq((11L, 1L, 1)))
      // batch 2: item 12 surges past 10 (cross-batch accumulation);
      // item 11's shard untouched -> emits nothing this batch
      hits(12L, 12L, 12L)
      q.processAllAvailable()
      q.stop()
      val all = spark.table("trend_out").as[TrendingItem].collect()
      val b2 = all.drop(b1.length)
      assert(b2.forall(_.bucket == 0L))
      assert(b2.map(t => (t.item_id, t.n_total, t.rank)).sortBy(_._3).toSeq
        === Seq((12L, 4L, 1), (10L, 2L, 2)))
      // exact global top-2 from the last emission per shard: the
      // best 2 of (12:4, 10:2, 11:1)
      val latest = (b2 ++ b1.filter(_.bucket == 1L))
        .sortBy(t => (-t.n_total, t.item_id)).take(2).map(_.item_id).toSeq
      assert(latest === Seq(12L, 10L))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
