package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks as primitives, composed from
  * built-ins per the preference order (compose > custom plan): as-of
  * join and gap-based sessionization — both everyday shapes in
  * event/training-data pipelines, and the as-of is natively present
  * in DuckDB (ASOF JOIN), which makes it oracle-checkable.
  *
  * Scale design: the as-of join is the union+window form — one
  * shuffle on the key, a single ordered pass per key — NOT the
  * equi-join + range-filter form whose intermediate is |L|×|matching
  * R| (that blowup is exactly what kills naive as-of at 100 TB).
  * Sessionization is two window passes over the same (key, ts)
  * ordering — one shuffle, no join at all.
  */
object Temporal {

  /** As-of join: for each left row, the greatest right ts ≤ left ts
    * within the key. Rows are tagged and interleaved (right sorts
    * before left on ties — "at or before" inclusive), then
    * last(..., ignoreNulls) over the running frame carries the most
    * recent right row forward.
    *
    * Tie rule (deterministic): when several right rows share
    * (user_id, ts_us), the max-event_id row wins — the window orders
    * by (ts_us, side, event_id) so the last right row the running
    * frame sees at a tied timestamp is the greatest event_id.
    */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    // expected columns: (user_id, ts_us, event_id, value)
    val r = right.select(col("user_id"), col("ts_us"),
      lit(0).as("side"), col("event_id"), col("value"))
    val l = left.select(col("user_id"), col("ts_us"),
      lit(1).as("side"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("m_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true)
          .over(w))
      .withColumn("m_ts",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true)
          .over(w))
      .withColumn("m_value",
        last(when(col("side") === 0, col("value")), ignoreNulls = true)
          .over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("m_id").as("matched_id"), col("m_ts").as("matched_ts_us"),
        col("m_value").as("matched_value"))
  }

  val AsofTolUs = 60L * 60 * 1000000 // 1-hour staleness SLA

  /** J10: as-of join with a staleness bound — the feature-store read
    * SLA semantic: a match older than `tolUs` is an EXPIRED feature,
    * no better than no match, so it nulls out and flags. Same
    * union+window plan as the unbounded as-of (one shuffle, one
    * ordered pass per key); the bound is a residual expression, and
    * the `is_expired` flag is the staleness-pressure monitor a
    * serving tier alerts on.
    */
  def asofJoinTol(left: DataFrame, right: DataFrame,
                  tolUs: Long = AsofTolUs): DataFrame = {
    val fresh = col("ts_us") - col("matched_ts_us") <= tolUs
    asofJoin(left, right)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        when(fresh, col("matched_id")).as("matched_id"),
        (col("matched_ts_us").isNotNull &&
          col("ts_us") - col("matched_ts_us") > tolUs).cast("long")
          .as("is_expired"),
        when(fresh, col("matched_ts_us")).as("matched_ts_us"),
        when(fresh, col("matched_value")).as("matched_value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("matched_id"), col("matched_ts_us"), col("matched_value"),
        col("is_expired"))
  }

  /** Gap sessionization: a new session starts where the gap to the
    * previous event of the same key exceeds `gapUs`; session_id is
    * the running count of starts, sessions then aggregate to
    * (first/last ts, n_events).
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val starts = events
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_start",
        (col("prev").isNull || col("ts_us") - col("prev") > gapUs)
          .cast("long"))
      .withColumn("session_id",
        sum(col("is_start")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    starts.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us",
        col("session_end_us") - col("session_start_us"))
  }

  /** Range join: pairs of same-user events within `windowUs` of each
    * other, via interval bucketing — each row lands in its
    * floor(ts/window) bucket, the left side also probes the next
    * bucket, so every qualifying pair meets in exactly one or two
    * equi-join buckets and the θ-condition only filters. The naive
    * form (equi on user + |Δts| filter) degrades to per-user cross
    * products; this form's join key is (user, bucket) — bounded fan-out
    * at any scale.
    */
  def rangeJoinPairs(events: DataFrame, windowUs: Long): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"), col("ts_us"))
    // pair order is by event_id, not time, so the partner's bucket can
    // be one below OR one above — probe all three
    val probe = e
      .withColumn("bucket", explode(array(
        (col("ts_us") / windowUs).cast("long") - 1,
        (col("ts_us") / windowUs).cast("long"),
        (col("ts_us") / windowUs).cast("long") + 1)))
    val build = e.withColumn("bucket", (col("ts_us") / windowUs).cast("long"))
    probe.as("a")
      .join(build.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.ts_us") - col("b.ts_us")) <= windowUs)
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("i"), col("b.event_id").as("j"),
        abs(col("a.ts_us") - col("b.ts_us")).as("delta_us"))
      .distinct()
  }

  // ---- driver-contract registry ----

  /** OHLC downsampling to fixed time buckets — the metrics-engine
    * resample. One shuffle on (series, bucket) serves both window
    * orderings and the aggregate; open/close are selected by
    * deterministic (ts, event_id) rank, the value sum is
    * micro-quantized to integers so bucket totals are order-free.
    * Output is bucket-grain: constant per series per time range no
    * matter the event volume.
    */
  def resampleOhlc(events: DataFrame, bucketUs: Long): DataFrame = {
    val b = events.withColumn("bucket", expr(s"ts_us div $bucketUs"))
    val w = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us"), col("event_id"))
    val wd = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    b.withColumn("rna", row_number().over(w))
      .withColumn("rnd", row_number().over(wd))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(when(col("rna") === 1, col("value"))).as("open"),
        max(when(col("rnd") === 1, col("value"))).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        sum(expr("CAST(ROUND(value * 1000000) AS BIGINT)")).as("vq"))
      .select(col("event_type"),
        (col("bucket") * bucketUs).as("bucket_start_us"),
        col("n"), col("open"), col("close"), col("high"), col("low"),
        round(col("vq").cast("double") / 1000000.0d, 6).as("vol"))
  }

  /** Dense time axis with zero-filled gaps: per-series hourly counts
    * joined onto the generated [min, max] bucket range. The axis is
    * |series| × |buckets| rows — independent of event volume — and
    * the 1-row bounds aggregate broadcasts.
    */
  def gapFill(events: DataFrame, bucketUs: Long): DataFrame = {
    val counts = events
      .groupBy(col("event_type"), expr(s"ts_us div $bucketUs").as("hb"))
      .agg(count(lit(1)).as("n_raw"),
        sum(expr("CAST(ROUND(value * 1000000) AS BIGINT)")).as("vq"))
    val bounds = events.agg(
      min(expr(s"ts_us div $bucketUs")).as("b0"),
      max(expr(s"ts_us div $bucketUs")).as("b1"))
    val axis = events.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds)) // 1-row build side
      .select(col("event_type"),
        explode(sequence(col("b0"), col("b1"))).as("hb"))
    axis.join(counts, Seq("event_type", "hb"), "left")
      .select(col("event_type"), (col("hb") * bucketUs).as("bucket_start_us"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        round(coalesce(col("vq"), lit(0L)).cast("double") / 1000000.0d, 6)
          .as("vol"))
  }

  /** SCD type-2 dimension history: compact each key's attribute
    * stream (here: the user's event_type) into validity intervals —
    * consecutive same-value observations collapse to one row with
    * [valid_from, valid_to) bounds, the open interval marked current.
    * The standard warehouse shape for "what was this dimension worth
    * at time t", queryable with a plain BETWEEN.
    *
    * Scale: two window passes and one aggregate, all over the same
    * (user_id) hash partitioning — Catalyst reuses a single exchange;
    * the second window runs on the run-compacted (much smaller)
    * relation. Determinism: observation order is (ts_us, event_id);
    * the attribute is constant within a run so min() reads it back.
    */
  def scd2Build(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val runs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        (col("prev_type").isNull || col("prev_type") =!= col("event_type"))
          .cast("long"))
      .withColumn("version", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    runs.groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_obs"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
      .withColumn("is_current", col("valid_to_us").isNull.cast("int"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("n_obs"),
        col("is_current"))
  }

  /** T25: incremental SCD2 MERGE — the lakehouse MERGE-INTO shape:
    * fold a delta batch of events into an existing SCD2 dimension
    * WITHOUT rebuilding history. Closed base versions pass through
    * untouched; each key's open version is extended (same type
    * continues: n_obs accumulates, validity inherits the delta
    * chain), or closed at the first delta timestamp (type changed),
    * or left open (no delta for the key); delta-local runs renumber
    * onto the base version counter. Correctness contract:
    * merge(build(events < t), events ≥ t) ≡ build(all events) for
    * EVERY cutoff t — the registered query runs the merge on a
    * midpoint split while its oracle is the full-rebuild SQL
    * verbatim, so the equivalence itself is what the driver checks.
    * Scale: the delta (a day) is run-compacted alone; the only
    * touch on the big dimension is one key-grain join against the
    * open rows — closed history is never read, which is the point
    * of incremental maintenance at 100 TB.
    */
  def scd2Merge(dim: DataFrame, delta: DataFrame): DataFrame = {
    val dl = scd2Build(delta).localCheckpoint(false) // 3 consumers
    val cur = dim.filter(col("is_current") === 1)
      .select(col("user_id"), col("version").as("base_ver"),
        col("event_type").as("base_type"),
        col("n_obs").as("base_obs"))
    val dd = dl.join(cur, Seq("user_id"), "left").localCheckpoint(false)
    // users whose first delta run continues the base's open run
    val contUsers = dd.filter(col("version") === 1 &&
        col("base_type").isNotNull &&
        col("base_type") === col("event_type"))
      .select(col("user_id"), col("valid_to_us").as("c_to"),
        col("n_obs").as("c_obs"), col("is_current").as("c_cur"))
    val firstFrom = dl.filter(col("version") === 1)
      .select(col("user_id"), col("valid_from_us").as("d_from"))
    val baseClosed = dim.filter(col("is_current") === 0)
    val baseCur = dim.filter(col("is_current") === 1)
      .join(contUsers, Seq("user_id"), "left")
      .join(firstFrom, Seq("user_id"), "left")
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"),
        when(col("c_obs").isNotNull, col("c_to"))
          .otherwise(col("d_from")).as("valid_to_us"),
        (col("n_obs") + coalesce(col("c_obs"), lit(0L))).as("n_obs"),
        when(col("c_obs").isNotNull, col("c_cur"))
          .when(col("d_from").isNotNull, lit(0))
          .otherwise(lit(1)).cast("int").as("is_current"))
    val deltaRows = dd
      .join(contUsers.select(col("user_id"), lit(1L).as("is_cont")),
        Seq("user_id"), "left")
      .filter(!(col("version") === 1 && col("is_cont").isNotNull))
      .select(col("user_id"),
        (col("version") + coalesce(col("base_ver"), lit(0L))
          - coalesce(col("is_cont"), lit(0L))).as("version"),
        col("event_type"), col("valid_from_us"), col("valid_to_us"),
        col("n_obs"), col("is_current"))
    baseClosed.unionByName(baseCur).unionByName(deltaRows)
  }

  /** Point-in-time (SCD2) lookup: each fact row joined to the
    * dimension version valid at the fact's timestamp —
    * valid_from ≤ ts < valid_to, open interval for the current row.
    * THE reason a warehouse keeps SCD2 history (training-data
    * pipelines call it temporal feature correctness: no peeking at
    * attributes from the future).
    *
    * Shape: an equi-join on the entity key with the interval as a
    * residual filter — per-key version counts are small (the run-
    * compacted dimension), so the per-key fan-out is bounded and
    * the join stays a plain shuffled hash join at any fact scale;
    * versions partition time, so at most one survives per fact.
    */
  def scd2Lookup(facts: DataFrame, dim: DataFrame): DataFrame =
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          facts("ts_us") >= dim("valid_from_us") &&
          (dim("valid_to_us").isNull ||
            facts("ts_us") < dim("valid_to_us")),
        "left")
      .select(facts("event_id"), facts("user_id"), facts("ts_us"),
        dim("version"), dim("event_type").as("state_at_ts"))

  private def ev(s: SparkSession, d: String) =
    Tables.events(s, d).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))

  val ZWin = 24
  val HourUs = 3600L * 1000000L

  /** TS3: rolling z-score anomaly detection over the per-type hourly
    * volume series — the alerting-tier monitor behind every "traffic
    * dropped/spiked" page: each bucket scores against the TRAILING
    * `w` observed buckets (current excluded, so the anomaly can't
    * shift its own baseline; the first w buckets of a series are
    * warm-up and drop). The flag decision is EXACT integer
    * arithmetic — |x−mean| ≥ 3σ rewritten over window sums as
    * (w·x−s)² ≥ 9·(w·ssq−s²), with the squares in DECIMAL(38)
    * (HUGEINT on the oracle) so a 10⁹-rows/hour series cannot
    * overflow — and the readable z is one fixed-shape double
    * division. A flat window (σ=0) flags any deviation.
    * Scale: one series-grain aggregate, one ordered window pass per
    * event_type — the resampleOhlc shuffle, nothing else.
    */
  def rollingAnomaly(events: DataFrame, bucketUs: Long = HourUs,
                     w: Int = ZWin): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = events
      .groupBy(col("event_type"), expr(s"ts_us div $bucketUs").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-w, -1)
    series
      .withColumn("w_cnt", count(lit(1)).over(win))
      .withColumn("s", sum(col("n")).over(win))
      .withColumn("ssq", sum(col("n").cast(dec) * col("n")).over(win))
      .filter(col("w_cnt") === w)
      .withColumn("num", col("n") * w - col("s"))
      .withColumn("varw", col("ssq") * w - col("s").cast(dec) * col("s"))
      .select(col("event_type"),
        (col("bucket") * bucketUs).as("bucket_start_us"), col("n"),
        when(col("varw") > 0, round(col("num").cast("double") /
          sqrt(col("varw").cast("double")), 6)).as("z"),
        when(col("varw") > 0,
          col("num").cast(dec) * col("num") >= col("varw") * 9)
          .otherwise(col("num") =!= 0L).cast("long").as("is_anomaly"))
  }

  val EwmaK = 8

  /** TS4 (beyond-ref): truncated exponential smoothing of the
    * per-type hourly volume series — the trend line every ops
    * dashboard draws next to the TS3 anomaly flags. The half-life
    * kernel is powers of two over the trailing `kk` OBSERVED buckets
    * (weight 2^(kk-1-age)), so every weighted sum is exact 64-bit
    * integer arithmetic — no float recursion, hence engine-identical
    * by construction (a classic α-recursive EWMA accumulates float
    * error and is order-dependent; the truncated kernel ≥ 99.6% of
    * the mass at kk=8 and is embarrassingly parallel).
    *
    * Shape, not a window: each source bucket EXPLODES its kk forward
    * contributions (scan-bandwidth, fan-out = kk) and one map-side-
    * combinable aggregate per (type, target bucket) sums kernel mass.
    * The adaptive denominator Σw over buckets actually observed
    * handles both series warm-up and gaps without a dense axis. At
    * 100 TB the shuffle carries series-grain rows × kk — independent
    * of event volume.
    */
  def ewmaSmooth(events: DataFrame, bucketUs: Long = HourUs,
                 kk: Int = EwmaK): DataFrame = {
    val weights = (0 until kk).map(o => 1L << (kk - 1 - o))
    val series = events
      .groupBy(col("event_type"), expr(s"ts_us div $bucketUs").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val contrib = series
      .select(col("event_type"), col("bucket"), col("n"),
        posexplode(typedLit(weights)).as(Seq("o", "w")))
      .select(col("event_type"), (col("bucket") + col("o")).as("bucket"),
        (col("n") * col("w")).as("wn"), col("w"))
    val sums = contrib.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("wn")).as("num"), sum(col("w")).as("den"))
    // Inner join back to the observed series: only real buckets emit
    // (a bucket's own weight is always present, so den ≥ 1).
    series.join(sums, Seq("event_type", "bucket"))
      .select(col("event_type"),
        (col("bucket") * bucketUs).as("bucket_start_us"), col("n"),
        expr("1000 * num div den").as("ewma_milli"))
  }

  /** TS5 (beyond-ref): CUSUM mean-shift detection over the per-type
    * hourly volume series — the change-point monitor that catches a
    * SUSTAINED drift the TS3 z-score (pointwise, trailing baseline)
    * re-absorbs into its own window after `w` buckets: CUSUM
    * accumulates every bucket's excess over (reference mean + slack),
    * so a persistent +60% shift keeps climbing until the alarm, no
    * matter how long ago it started.
    *
    * The recursion S_t = max(0, S_{t-1} + y_t) looks inherently
    * sequential, but has the closed form
    *   S_t = cs_t − min(0, min_{j≤t} cs_j),   cs = running Σy
    * (induction: subtracting the running minimum is exactly the
    * last reset-to-zero) — so the whole detector is ONE ordered
    * window pass per event_type at series grain: cumsum + running
    * min, both over the same (type, bucket) ordering, one shuffle.
    *
    * Exact integers end to end: the reference window is the series'
    * first half of buckets per type (the ops_drift_psi midpoint
    * device); with refN its bucket count and refS its row sum, the
    * per-bucket deviation is scaled by refN —
    *   y_t = n_t·refN − refS − refS div 2
    * (= refN·(n_t − μ·1.5) without any division by refN), slack =
    * half the reference mean, alarm at S > 5·refS (≈ five reference-
    * mean-buckets of accumulated excess). Engine-identical: every
    * quantity is BIGINT arithmetic on non-negatives (div == //);
    * |cs| ≤ total_rows·refN, so a 10¹²-row series with a 10⁴-bucket
    * reference stays < 2⁶³.
    */
  def cusumShift(events: DataFrame, bucketUs: Long = HourUs): DataFrame = {
    val series = events
      .groupBy(col("event_type"), expr(s"ts_us div $bucketUs").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val ref = series
      .groupBy(col("event_type"))
      .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
      .join(series, Seq("event_type"))
      .filter(col("bucket") <= expr("(mn + mx) div 2"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("refn"), sum(col("n")).as("refs"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.join(ref, Seq("event_type"))
      .withColumn("y",
        col("n") * col("refn") - col("refs") - expr("refs div 2"))
      .withColumn("cs", sum(col("y")).over(w))
      .withColumn("lo", least(lit(0L), min(col("cs")).over(w)))
      .select(col("event_type"),
        (col("bucket") * bucketUs).as("bucket_start_us"), col("n"),
        (col("cs") - col("lo")).as("cusum"),
        (col("cs") - col("lo") > col("refs") * 5).cast("long")
          .as("is_alarm"))
  }

  val DayUs: Long = 24L * 3600 * 1000000
  val TrendW = 7

  /** TS6 (beyond-ref): classical seasonal decomposition of the
    * per-type DAILY volume series — n = trend + seasonal + residual,
    * the read that separates "we're growing" (trend) from "it's
    * Saturday" (seasonal) from "something happened" (residual, the
    * input TS3/TS5 would rather monitor). Textbook additive
    * decomposition, each phase an established exact-integer device:
    * trend = centered 7-day moving average in milli (full windows
    * only — edge days emit null trend/seasonal/residual), seasonal =
    * per-day-of-week mean of the detrended series (epoch-day mod-7
    * DOW, offset-then-divide for the negative means), residual =
    * detrended − seasonal. Windows and aggregates run at (type, day)
    * grain — bounded by the calendar, never row count.
    */
  def decompose(events: DataFrame): DataFrame = {
    val series = events
      .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
      .agg(count(lit(1)).as("n"))
    val half = TrendW / 2
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-half, half)
    val trended = series
      .withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("tsum", sum(col("n")).over(w))
      .withColumn("trend_milli",
        when(col("w_cnt") === TrendW,
          expr(s"(tsum * 1000) div $TrendW")))
      .withColumn("detr",
        when(col("trend_milli").isNotNull,
          col("n") * 1000 - col("trend_milli")))
    // per-(type, dow) seasonal mean over the fully-trended days;
    // detr can be negative -> offset-then-divide (|detr| < 2^40·1000
    // comfortably, offset 2^50 per row keeps the dividend positive)
    val off = 1L << 50
    val seasonal = trended.filter(col("detr").isNotNull)
      .withColumn("dow", expr("day % 7"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("sc"), sum(col("detr")).as("sd"))
      .select(col("event_type"), col("dow"),
        (expr(s"(sd + $off * sc) div sc") - off).as("seasonal_milli"))
    trended.withColumn("dow", expr("day % 7"))
      .join(seasonal, Seq("event_type", "dow"), "left")
      .select(col("event_type"), (col("day") * DayUs).as("day_start_us"),
        col("n"), col("trend_milli"),
        when(col("detr").isNotNull, col("seasonal_milli"))
          .as("seasonal_milli"),
        when(col("detr").isNotNull,
          col("detr") - col("seasonal_milli")).as("residual_milli"))
  }

  /** Full-rebuild SCD2 SQL — the oracle for both scd2_history and
    * scd2_merge (the merge must reproduce the rebuild exactly).
    */
  private val scd2HistorySql =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
      |  event_type FROM events),
      |g AS (SELECT user_id, ts_us, event_id, event_type,
      |  CASE WHEN lag(event_type) OVER w IS NULL
      |    OR lag(event_type) OVER w <> event_type
      |    THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |v AS (SELECT user_id, ts_us, event_type,
      |  CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      |  FROM g),
      |runs AS (SELECT user_id, version,
      |    MIN(event_type) AS event_type,
      |    MIN(ts_us) AS valid_from_us,
      |    COUNT(*) AS n_obs
      |  FROM v GROUP BY 1, 2)
      |SELECT user_id, version, event_type, valid_from_us,
      |lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
      |  AS valid_to_us,
      |n_obs,
      |CAST(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
      |  IS NULL AS INT) AS is_current
      |FROM runs""".stripMargin

  val AcfMaxLag = 7

  /** TS7 (beyond-ref): lag-1..7 autocorrelation of the per-type daily
    * volume series — the seasonality detector that DECIDES ts_decompose's
    * period (a weekly-cycled series shows the lag-7 peak) and whether
    * TS3's independence assumption holds at all. Pearson r over the
    * aligned (day, day+lag) pairs from exact sufficient statistics:
    * counts and cross-products sum in DECIMAL(38) (HUGEINT on the
    * oracle — a 10⁹-rows/day series squares to 10¹⁸ per pair, past
    * Long), then ONE double division + sqrt per (type, lag) — the
    * trendSlope closed form with the series joined to itself.
    *
    * Scale shape: the series aggregate is the decompose shuffle; the
    * lag join runs at (type, day) grain — calendar-bounded — times a
    * 7-row broadcast lag relation. Output is |types|·7 rows always.
    * Degenerate series (under 2 pairs, or zero variance on either
    * side — engines disagree on 0/0) are filtered, as in trendSlope.
    */
  def autocorr(events: DataFrame, maxLag: Int = AcfMaxLag): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = events
      .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // referenced by both sides of the lag join
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = series.as("a")
      .crossJoin(broadcast(lags))
      .join(series.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.day") === col("a.day") + col("lag"))
      .select(col("a.event_type").as("event_type"), col("lag"),
        col("a.n").as("x"), col("b.n").as("y"))
    pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"))
      .withColumn("vx",
        col("sxx") * col("m") - col("sx").cast(dec) * col("sx"))
      .withColumn("vy",
        col("syy") * col("m") - col("sy").cast(dec) * col("sy"))
      .filter(col("m") >= 2 && col("vx") > 0 && col("vy") > 0)
      .select(col("event_type"), col("lag"), col("m").as("n_pairs"),
        round((col("sxy") * col("m") - col("sx").cast(dec) * col("sy"))
          .cast("double") /
          sqrt(col("vx").cast("double") * col("vy").cast("double")), 6)
          .as("r"))
  }

  private val autocorrSql: String =
    s"""WITH series AS (SELECT event_type,
       |    epoch_us(ts) // $DayUs AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |p AS (SELECT a.event_type, l.lag, a.n AS x, b.n AS y
       |  FROM series a
       |  CROSS JOIN generate_series(1, $AcfMaxLag) l(lag)
       |  JOIN series b ON a.event_type = b.event_type
       |    AND b.day = a.day + l.lag),
       |st AS (SELECT event_type, lag, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * y) AS syy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM p GROUP BY 1, 2),
       |v AS (SELECT *, sxx * m - CAST(sx AS HUGEINT) * sx AS vx,
       |    syy * m - CAST(sy AS HUGEINT) * sy AS vy
       |  FROM st)
       |SELECT event_type, CAST(lag AS BIGINT) AS lag, m AS n_pairs,
       |ROUND(CAST(sxy * m - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |  / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)), 6) AS r
       |FROM v WHERE m >= 2 AND vx > 0 AND vy > 0""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // TS3 (beyond-ref): trailing-window anomaly flags — see
    // rollingAnomaly for the exact-integer decision rule.
    QueryDef("ts_rolling_z",
      (s, d) => rollingAnomaly(ev(s, d)),
      Some(s"""WITH series AS (SELECT event_type,
              |    epoch_us(ts) // $HourUs AS bucket,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1, 2),
              |win AS (SELECT event_type, bucket, n,
              |    COUNT(*) OVER tw AS w_cnt,
              |    SUM(n) OVER tw AS s,
              |    SUM(CAST(n AS HUGEINT) * n) OVER tw AS ssq
              |  FROM series WINDOW tw AS (PARTITION BY event_type
              |    ORDER BY bucket ROWS BETWEEN $ZWin PRECEDING
              |    AND 1 PRECEDING)),
              |f AS (SELECT event_type, bucket, n,
              |    n * $ZWin - s AS num,
              |    ssq * $ZWin - CAST(s AS HUGEINT) * s AS varw
              |  FROM win WHERE w_cnt = $ZWin)
              |SELECT event_type, bucket * $HourUs AS bucket_start_us, n,
              |CASE WHEN varw > 0 THEN ROUND(CAST(num AS DOUBLE)
              |  / sqrt(CAST(varw AS DOUBLE)), 6) END AS z,
              |CAST(CASE WHEN varw > 0
              |  THEN CAST(num AS HUGEINT) * num >= varw * 9
              |  ELSE num <> 0 END AS BIGINT) AS is_anomaly
              |FROM f""".stripMargin)),

    // TS4 (beyond-ref): truncated-kernel EWMA — see ewmaSmooth for
    // the exact-integer forward-contribution shape.
    QueryDef("ts_ewma",
      (s, d) => ewmaSmooth(ev(s, d)),
      Some(s"""WITH series AS (SELECT event_type,
              |    epoch_us(ts) // $HourUs AS bucket,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1, 2),
              |c AS (SELECT event_type, bucket + o.o AS bucket,
              |    n * (1 << (${EwmaK - 1} - o.o)) AS wn,
              |    CAST(1 << (${EwmaK - 1} - o.o) AS BIGINT) AS w
              |  FROM series,
              |    (SELECT unnest(generate_series(0, ${EwmaK - 1})) AS o) o),
              |sums AS (SELECT event_type, bucket,
              |    SUM(wn) AS num, SUM(w) AS den
              |  FROM c GROUP BY 1, 2)
              |SELECT s.event_type, s.bucket * $HourUs AS bucket_start_us,
              |s.n, CAST(1000 * num // den AS BIGINT) AS ewma_milli
              |FROM series s JOIN sums USING (event_type, bucket)""".stripMargin)),

    // TS5 (beyond-ref): CUSUM sustained-shift detection — see
    // cusumShift for the closed-form reset identity and the
    // exact-integer scaling.
    QueryDef("ts_cusum",
      (s, d) => cusumShift(ev(s, d)),
      Some(s"""WITH series AS (SELECT event_type,
              |    epoch_us(ts) // $HourUs AS bucket,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1, 2),
              |b AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
              |  FROM series GROUP BY 1),
              |ref AS (SELECT s.event_type,
              |    CAST(COUNT(*) AS BIGINT) AS refn,
              |    CAST(SUM(n) AS BIGINT) AS refs
              |  FROM series s JOIN b USING (event_type)
              |  WHERE bucket <= (mn + mx) // 2 GROUP BY 1),
              |y AS (SELECT s.event_type, bucket, n, refs,
              |    n * refn - refs - refs // 2 AS y
              |  FROM series s JOIN ref USING (event_type)),
              |c AS (SELECT event_type, bucket, n, refs,
              |    CAST(SUM(y) OVER w AS BIGINT) AS cs
              |  FROM y WINDOW w AS (PARTITION BY event_type ORDER BY bucket
              |    ROWS UNBOUNDED PRECEDING)),
              |m AS (SELECT event_type, bucket, n, refs, cs,
              |    LEAST(CAST(0 AS BIGINT), CAST(MIN(cs) OVER w AS BIGINT))
              |      AS lo
              |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket
              |    ROWS UNBOUNDED PRECEDING))
              |SELECT event_type, bucket * $HourUs AS bucket_start_us, n,
              |cs - lo AS cusum,
              |CAST(cs - lo > refs * 5 AS BIGINT) AS is_alarm
              |FROM m""".stripMargin)),

    // TS6 (beyond-ref): classical additive decomposition — see
    // decompose for the trend/seasonal/residual devices.
    QueryDef("ts_decompose",
      (s, d) => decompose(ev(s, d)),
      Some(s"""WITH series AS (SELECT event_type,
              |    epoch_us(ts) // $DayUs AS day,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM events GROUP BY 1, 2),
              |t AS (SELECT event_type, day, n,
              |    COUNT(*) OVER cw AS w_cnt,
              |    CAST(SUM(n) OVER cw AS BIGINT) AS tsum
              |  FROM series WINDOW cw AS (PARTITION BY event_type
              |    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              |d AS (SELECT event_type, day, n,
              |    CASE WHEN w_cnt = $TrendW
              |      THEN (tsum * 1000) // $TrendW END AS trend_milli,
              |    CASE WHEN w_cnt = $TrendW
              |      THEN n * 1000 - (tsum * 1000) // $TrendW END AS detr
              |  FROM t),
              |seas AS (SELECT event_type, day % 7 AS dow,
              |    CAST(COUNT(*) AS BIGINT) sc,
              |    CAST(SUM(detr) AS BIGINT) sd
              |  FROM d WHERE detr IS NOT NULL GROUP BY 1, 2),
              |s2 AS (SELECT event_type, dow,
              |    (sd + ${1L << 50} * sc) // sc - ${1L << 50}
              |      AS seasonal_milli
              |  FROM seas)
              |SELECT d.event_type, day * $DayUs AS day_start_us, n,
              |trend_milli,
              |CASE WHEN detr IS NOT NULL THEN seasonal_milli END
              |  AS seasonal_milli,
              |CASE WHEN detr IS NOT NULL THEN detr - seasonal_milli END
              |  AS residual_milli
              |FROM d LEFT JOIN s2 ON d.event_type = s2.event_type
              |  AND day % 7 = s2.dow""".stripMargin)),

    // As-of: each purchase matched to the user's most recent
    // non-purchase event at-or-before it. Oracle uses DuckDB's native
    // ASOF LEFT JOIN over the same epoch-micros key.
    QueryDef("j5_asof_join",
      (s, d) => {
        val e = ev(s, d)
        asofJoin(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us"), col("event_id"), col("value")),
          e.filter(col("event_type") =!= "purchase")
            .select(col("user_id"), col("ts_us"), col("event_id"), col("value")))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
             |  event_type, value FROM events),
             |l AS (SELECT * FROM e WHERE event_type = 'purchase'),
             |r AS (SELECT event_id, user_id, ts_us, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
             |    ORDER BY event_id DESC) rn
             |  FROM e WHERE event_type <> 'purchase') WHERE rn = 1)
             |SELECT l.event_id, l.user_id, l.ts_us,
             |r.event_id AS matched_id, r.ts_us AS matched_ts_us,
             |r.value AS matched_value
             |FROM l ASOF LEFT JOIN r
             |ON l.user_id = r.user_id AND l.ts_us >= r.ts_us""".stripMargin)),

    // J10 (beyond-ref): staleness-bounded as-of — see asofJoinTol.
    QueryDef("j10_asof_tolerance",
      (s, d) => {
        val e = ev(s, d)
        asofJoinTol(
          e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us"), col("event_id"), col("value")),
          e.filter(col("event_type") =!= "purchase")
            .select(col("user_id"), col("ts_us"), col("event_id"), col("value")))
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
              |  event_type, value FROM events),
              |l AS (SELECT * FROM e WHERE event_type = 'purchase'),
              |r AS (SELECT event_id, user_id, ts_us, value FROM (
              |  SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
              |    ORDER BY event_id DESC) rn
              |  FROM e WHERE event_type <> 'purchase') WHERE rn = 1),
              |j AS (SELECT l.event_id, l.user_id, l.ts_us,
              |  r.event_id AS matched_id, r.ts_us AS matched_ts_us,
              |  r.value AS matched_value
              |  FROM l ASOF LEFT JOIN r
              |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us)
              |SELECT event_id, user_id, ts_us,
              |CASE WHEN ts_us - matched_ts_us <= $AsofTolUs
              |  THEN matched_id END AS matched_id,
              |CASE WHEN ts_us - matched_ts_us <= $AsofTolUs
              |  THEN matched_ts_us END AS matched_ts_us,
              |CASE WHEN ts_us - matched_ts_us <= $AsofTolUs
              |  THEN matched_value END AS matched_value,
              |CAST(matched_ts_us IS NOT NULL
              |  AND ts_us - matched_ts_us > $AsofTolUs AS BIGINT) AS is_expired
              |FROM j""".stripMargin)),

    // Range join: same-user event pairs within 60 seconds — the
    // bucketed form; the oracle states the same relation as a plain
    // θ-join (fine for DuckDB's optimizer at oracle scale).
    QueryDef("j6_range_join",
      (s, d) => rangeJoinPairs(ev(s, d), 60L * 1000000),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us
             |  FROM events)
             |SELECT a.user_id, a.event_id AS i, b.event_id AS j,
             |ABS(a.ts_us - b.ts_us) AS delta_us
             |FROM e a JOIN e b ON a.user_id = b.user_id
             |AND a.event_id < b.event_id
             |AND ABS(a.ts_us - b.ts_us) <= 60000000""".stripMargin)),

    // Sessionization at a 30-minute gap.
    QueryDef("st5_sessionize",
      (s, d) => sessionize(ev(s, d), 30L * 60 * 1000000),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us
             |  FROM events),
             |g AS (SELECT user_id, ts_us, event_id,
             |  CASE WHEN lag(ts_us) OVER w IS NULL
             |    OR ts_us - lag(ts_us) OVER w > 1800000000
             |    THEN 1 ELSE 0 END AS is_start
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |sess AS (SELECT user_id, ts_us,
             |  CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id,
             |MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
             |COUNT(*) AS n_events,
             |MAX(ts_us) - MIN(ts_us) AS duration_us
             |FROM sess GROUP BY user_id, session_id""".stripMargin)),

    // E8 (beyond-ref): daily bounce rate — share of sessions with a
    // single event, the engagement-health headline over the st5
    // sessions. Session grain in, day grain out; rate is an exact
    // ppm integer division.
    QueryDef("e8_bounce_rate",
      (s, d) => sessionize(ev(s, d), 30L * 60 * 1000000)
        .groupBy(to_date(timestamp_micros(col("session_start_us")))
          .as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum((col("n_events") === 1).cast("long")).as("n_bounce"))
        .withColumn("bounce_ppm",
          expr("(n_bounce * 1000000) div n_sessions")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us
             |  FROM events),
             |g AS (SELECT user_id, ts_us, event_id,
             |  CASE WHEN lag(ts_us) OVER w IS NULL
             |    OR ts_us - lag(ts_us) OVER w > 1800000000
             |    THEN 1 ELSE 0 END AS is_start
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |sess AS (SELECT user_id, ts_us,
             |  CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM g),
             |s2 AS (SELECT user_id, session_id,
             |    MIN(ts_us) AS session_start_us, COUNT(*) AS n_events
             |  FROM sess GROUP BY 1, 2)
             |SELECT CAST(make_timestamp(session_start_us) AS DATE) AS day,
             |CAST(COUNT(*) AS BIGINT) AS n_sessions,
             |CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |  AS n_bounce,
             |CAST((SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000)
             |  // COUNT(*) AS BIGINT) AS bounce_ppm
             |FROM s2 GROUP BY 1""".stripMargin)),

    // The type-1 ("current truth") view over the SCD2 history — what
    // most consumers actually query: each user's open version, with
    // the version counter doubling as versions-to-date. A filter on
    // the run-compacted dimension, no extra shuffle.
    QueryDef("scd2_current",
      (s, d) => scd2Build(ev(s, d))
        .filter(col("is_current") === 1)
        .select(col("user_id"), col("event_type").as("current_state"),
          col("valid_from_us").as("since_us"),
          col("version").as("n_versions")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
             |  event_type FROM events),
             |g AS (SELECT user_id, ts_us, event_id, event_type,
             |  CASE WHEN lag(event_type) OVER w IS NULL
             |    OR lag(event_type) OVER w <> event_type
             |    THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |v AS (SELECT user_id, ts_us, event_type,
             |  CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
             |  FROM g),
             |runs AS (SELECT user_id, version,
             |    MIN(event_type) AS event_type,
             |    MIN(ts_us) AS valid_from_us
             |  FROM v GROUP BY 1, 2),
             |cur AS (SELECT user_id, version, event_type, valid_from_us,
             |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             |    AS valid_to_us
             |  FROM runs)
             |SELECT user_id, event_type AS current_state,
             |valid_from_us AS since_us, version AS n_versions
             |FROM cur WHERE valid_to_us IS NULL""".stripMargin)),

    QueryDef("ts_resample_ohlc",
      (s, d) => resampleOhlc(ev(s, d), 300L * 1000000),
      Some("""WITH e AS (SELECT event_id, event_type, epoch_us(ts) ts_us,
             |    value FROM events),
             |b AS (SELECT *, ts_us // 300000000 AS bucket FROM e),
             |r AS (SELECT *,
             |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts_us, event_id) rna,
             |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts_us DESC, event_id DESC) rnd
             |  FROM b)
             |SELECT event_type,
             |CAST(bucket * 300000000 AS BIGINT) AS bucket_start_us,
             |CAST(COUNT(*) AS BIGINT) AS n,
             |MAX(CASE WHEN rna = 1 THEN value END) AS open,
             |MAX(CASE WHEN rnd = 1 THEN value END) AS close,
             |MAX(value) AS high, MIN(value) AS low,
             |ROUND(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
             |  / 1000000.0, 6) AS vol
             |FROM r GROUP BY 1, 2""".stripMargin)),

    QueryDef("ts_gap_fill",
      (s, d) => gapFill(ev(s, d), 3600L * 1000000),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) ts_us, value
             |  FROM events),
             |c AS (SELECT event_type, ts_us // 3600000000 AS hb,
             |    CAST(COUNT(*) AS BIGINT) AS n_raw,
             |    CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS vq
             |  FROM e GROUP BY 1, 2),
             |bounds AS (SELECT MIN(ts_us // 3600000000) b0,
             |    MAX(ts_us // 3600000000) b1 FROM e),
             |axis AS (SELECT t.event_type, g.hb FROM
             |  (SELECT DISTINCT event_type FROM e) t,
             |  (SELECT unnest(generate_series(b0, b1)) AS hb FROM bounds) g)
             |SELECT axis.event_type,
             |CAST(axis.hb * 3600000000 AS BIGINT) AS bucket_start_us,
             |COALESCE(c.n_raw, 0) AS n,
             |ROUND(CAST(COALESCE(c.vq, 0) AS DOUBLE) / 1000000.0, 6) AS vol
             |FROM axis LEFT JOIN c
             |  ON axis.event_type = c.event_type AND axis.hb = c.hb""".stripMargin)),

    // SCD2 history of each user's event_type over time.
    QueryDef("scd2_history",
      (s, d) => scd2Build(ev(s, d)),
      Some(scd2HistorySql)),

    // T25 (beyond-ref): incremental SCD2 MERGE on a midpoint split of
    // the stream — the oracle is the FULL-REBUILD SQL verbatim, so
    // what the driver checks is the maintenance invariant itself:
    // merge(build(events < t), events ≥ t) ≡ build(all events).
    QueryDef("scd2_merge",
      (s, d) => {
        val e = ev(s, d).localCheckpoint(false) // split both ways
        val mid = e.agg(
          expr("(min(ts_us) + max(ts_us)) div 2").as("mid_us"))
        val withMid = e.crossJoin(broadcast(mid)) // 1-row cutoff
        val cols = e.columns.map(col(_)).toSeq
        val base = withMid.filter(col("ts_us") < col("mid_us"))
          .select(cols: _*)
        val delta = withMid.filter(col("ts_us") >= col("mid_us"))
          .select(cols: _*)
        scd2Merge(scd2Build(base), delta)
      },
      Some(scd2HistorySql)),

    // Point-in-time lookup: every purchase joined to the SCD2 state
    // (built from the user's non-purchase events) valid at purchase
    // time — purchases before any state row keep NULLs via the left
    // join.
    QueryDef("scd2_pointintime",
      (s, d) => {
        val e = ev(s, d)
        scd2Lookup(
          e.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts_us")),
          scd2Build(e.filter(col("event_type") =!= "purchase")))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
             |  event_type FROM events),
             |ne AS (SELECT * FROM e WHERE event_type <> 'purchase'),
             |g AS (SELECT user_id, ts_us, event_id, event_type,
             |  CASE WHEN lag(event_type) OVER w IS NULL
             |    OR lag(event_type) OVER w <> event_type
             |    THEN 1 ELSE 0 END AS chg
             |  FROM ne WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |v AS (SELECT user_id, ts_us, event_type,
             |  CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
             |  FROM g),
             |runs AS (SELECT user_id, version,
             |    MIN(event_type) AS event_type,
             |    MIN(ts_us) AS valid_from_us
             |  FROM v GROUP BY 1, 2),
             |dim AS (SELECT user_id, version, event_type, valid_from_us,
             |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             |    AS valid_to_us
             |  FROM runs)
             |SELECT f.event_id, f.user_id, f.ts_us, dim.version,
             |dim.event_type AS state_at_ts
             |FROM (SELECT event_id, user_id, ts_us FROM e
             |  WHERE event_type = 'purchase') f
             |LEFT JOIN dim ON f.user_id = dim.user_id
             |  AND f.ts_us >= dim.valid_from_us
             |  AND (dim.valid_to_us IS NULL OR f.ts_us < dim.valid_to_us)""".stripMargin)),

    // TS7 (beyond-ref): lag-1..7 autocorrelation — see autocorr for
    // the exact-sufficient-statistics closed form.
    QueryDef("ts_autocorr",
      (s, d) => autocorr(ev(s, d)), Some(autocorrSql))
  )
}
