package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / pipeline-ops operators — the contract checks a
  * production lake runs before promoting a partition (the reference
  * gates its silver layer with row-level validity filters,
  * daily_pipeline.py's cleaning step; these are the table-level
  * acceptance monitors that complement them, in the style of
  * Deequ/Great Expectations constraint suites).
  *
  * Scale design (100 TB):
  *  - the expectation suite is ONE scan + a two-phase aggregate
  *    (the uniqueness check's exact distinct adds one shuffle at
  *    key grain, partial-aggregated map-side); output is constant
  *    (one row per named check);
  *  - the KS drift monitor collapses to whole-unit value grain
  *    BEFORE its cumulative window (the `Stats.valueCuts` device):
  *    the window input is |distinct dollars| — bounded by the price
  *    domain, never row count;
  *  - the MAD outlier monitor is the same device per group: both
  *    medians (value, then absolute deviation) run over
  *    (type × distinct centi-value) grain, so no data-sized window
  *    partition exists — unlike a naive per-type row_number sort;
  *  - incremental view maintenance merges partial aggregates
  *    (count/decimal-sum are commutative monoids) — the nightly
  *    refresh touches only the delta, and the oracle proves the
  *    merged state equals the full rebuild;
  *  - the deterministic shuffle is a pure per-row mod-prime mixing
  *    hash (engine-exact BIGINT arithmetic, no wrap) + one shuffle
  *    into shard files — the standard global-shuffle-before-
  *    training materialization, one task per output shard.
  */
object Quality {

  private def ord(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("event_type"), col("value"))
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** Deequ-style expectation suite over `orders`: one aggregate pass
    * computes every constraint's satisfied-count; each check emits
    * (check, observed_ppm, pass). observed_ppm is exact integer
    * floor((n_ok * 1e6) / n) — no float in the metric.
    */
  def dqExpectations(orders: DataFrame): DataFrame = {
    val agg = orders.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("c_cust"),
      countDistinct(col("o_orderkey")).as("c_uniq"),
      sum((col("o_totalprice") >= lit(0d)).cast("long")).as("c_nonneg"),
      sum(col("o_orderstatus").isin("O", "F", "P").cast("long"))
        .as("c_status"),
      sum(col("o_orderpriority").rlike("^[1-5]-").cast("long")).as("c_prio"),
      sum((col("o_orderdate") >= lit("1990-01-01") &&
        col("o_orderdate") < lit("2006-01-01")).cast("long")).as("c_date"))
    agg.selectExpr(
      "n",
      """stack(6,
        | 'completeness_custkey', c_cust,
        | 'uniqueness_orderkey',  c_uniq,
        | 'nonneg_totalprice',    c_nonneg,
        | 'domain_orderstatus',   c_status,
        | 'pattern_orderpriority', c_prio,
        | 'bounds_orderdate',     c_date) AS (check_name, n_ok)""".stripMargin)
      .select(col("check_name"),
        expr("n_ok * 1000000 div n").as("observed_ppm"),
        (expr("n_ok * 1000000 div n") === lit(1000000L)).cast("long")
          .as("pass"))
  }

  private val dqExpectationsSql: String =
    """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) n,
      |    CAST(COUNT(o_custkey) AS BIGINT) c_cust,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) c_uniq,
      |    CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      c_nonneg,
      |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0
      |      END) AS BIGINT) c_status,
      |    CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
      |      THEN 1 ELSE 0 END) AS BIGINT) c_prio,
      |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
      |      AND o_orderdate < TIMESTAMP '2006-01-01' THEN 1 ELSE 0 END)
      |      AS BIGINT) c_date
      |  FROM orders),
      |s AS (
      |  SELECT 'completeness_custkey' AS check_name, c_cust AS n_ok, n FROM a
      |  UNION ALL SELECT 'uniqueness_orderkey', c_uniq, n FROM a
      |  UNION ALL SELECT 'nonneg_totalprice', c_nonneg, n FROM a
      |  UNION ALL SELECT 'domain_orderstatus', c_status, n FROM a
      |  UNION ALL SELECT 'pattern_orderpriority', c_prio, n FROM a
      |  UNION ALL SELECT 'bounds_orderdate', c_date, n FROM a)
      |SELECT check_name, CAST(n_ok * 1000000 // n AS BIGINT) AS observed_ppm,
      |CAST(CASE WHEN n_ok * 1000000 // n = 1000000 THEN 1 ELSE 0 END
      |  AS BIGINT) AS pass
      |FROM s""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov drift between the first and
    * second half of the order history (same midpoint split as
    * ops_drift_psi), at whole-dollar value grain: D is the max over
    * dollar cutpoints of |F_ref - F_cur|, kept as the integer
    * cross-product |cum_ref·t_cur - cum_cur·t_ref| in DECIMAL(38)
    * until ONE final double division. Complements PSI: KS is
    * binning-free at the chosen grain and has distribution-free
    * critical values.
    */
  def ksDrift(orders: DataFrame): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val o = orders.select(to_date(col("o_orderdate")).as("od"),
      floor(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("long").as("dollars"))
    val mid = o.agg(min(col("od")).as("dmin"), max(col("od")).as("dmax"))
      .select(date_add(col("dmin"),
        floor(datediff(col("dmax"), col("dmin")) / lit(2)).cast("int"))
        .as("dmid"))
    val counts = o.crossJoin(broadcast(mid))
      .withColumn("cur", (col("od") >= col("dmid")).cast("long"))
      .groupBy(col("dollars"))
      .agg(sum(lit(1L) - col("cur")).as("n_ref"),
        sum(col("cur")).as("n_cur"))
    // value-grain cumulative CDF counts (bounded by the price domain)
    val wcum = Window.orderBy(col("dollars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(lit(1))
    val cum = counts
      .withColumn("cum_ref", sum(col("n_ref")).over(wcum))
      .withColumn("cum_cur", sum(col("n_cur")).over(wcum))
      .withColumn("t_ref", sum(col("n_ref")).over(wall))
      .withColumn("t_cur", sum(col("n_cur")).over(wall))
      .withColumn("d_num",
        abs(col("cum_ref").cast(dec38) * col("t_cur").cast(dec38) -
          col("cum_cur").cast(dec38) * col("t_ref").cast(dec38)))
    cum.orderBy(col("d_num").desc, col("dollars"))
      .limit(1)
      .select(col("dollars").as("at_dollars"),
        round(col("d_num").cast("double") * lit(1000000.0d) /
          (col("t_ref").cast("double") * col("t_cur").cast("double")))
          .cast("long").as("ks_ppm"),
        col("t_ref"), col("t_cur"))
  }

  private val ksDriftSql: String =
    """WITH o AS (SELECT CAST(o_orderdate AS DATE) od,
      |    CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT)
      |      AS dollars FROM orders),
      |mid AS (SELECT MIN(od) + CAST(FLOOR(
      |    date_diff('day', MIN(od), MAX(od)) / 2) AS INT) AS dmid FROM o),
      |c AS (SELECT dollars,
      |    CAST(SUM(CASE WHEN od >= dmid THEN 0 ELSE 1 END) AS BIGINT) n_ref,
      |    CAST(SUM(CASE WHEN od >= dmid THEN 1 ELSE 0 END) AS BIGINT) n_cur
      |  FROM o, mid GROUP BY 1),
      |cum AS (SELECT dollars,
      |    SUM(n_ref) OVER (ORDER BY dollars ROWS UNBOUNDED PRECEDING)
      |      AS cum_ref,
      |    SUM(n_cur) OVER (ORDER BY dollars ROWS UNBOUNDED PRECEDING)
      |      AS cum_cur,
      |    SUM(n_ref) OVER () AS t_ref, SUM(n_cur) OVER () AS t_cur
      |  FROM c),
      |d AS (SELECT dollars, t_ref, t_cur,
      |    ABS(CAST(cum_ref AS DECIMAL(38,0)) * t_cur -
      |        CAST(cum_cur AS DECIMAL(38,0)) * t_ref) AS d_num
      |  FROM cum)
      |SELECT dollars AS at_dollars,
      |CAST(ROUND(CAST(d_num AS DOUBLE) * 1000000.0 /
      |  (CAST(t_ref AS DOUBLE) * CAST(t_cur AS DOUBLE))) AS BIGINT)
      |  AS ks_ppm,
      |CAST(t_ref AS BIGINT) AS t_ref, CAST(t_cur AS BIGINT) AS t_cur
      |FROM d ORDER BY d_num DESC, dollars LIMIT 1""".stripMargin

  /** Per-event-type robust outlier monitor via median absolute
    * deviation at centi-value grain. Both medians are the LOWER
    * discrete median (min value whose cumulative count reaches
    * (n+1) div 2) — exact integer arithmetic, engine-identical, and
    * every window runs over (type × distinct centi-value) grain,
    * bounded by the value domain. Outlier rule: |v - med| > 3·MAD.
    */
  def madOutliers(events: DataFrame): DataFrame = {
    val v = events.select(col("event_type"),
      round(col("value") * lit(100.0d)).cast("long").as("vc"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String)
    : DataFrame = {
      val g = df.groupBy(col("event_type"), col(valueCol))
        .agg(count(lit(1)).as("cnt"))
      val wcum = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy(col("event_type"))
      g.withColumn("cum", sum(col("cnt")).over(wcum))
        .withColumn("n", sum(col("cnt")).over(wall))
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= expr("(n + 1) div 2"), col(valueCol)))
          .as(out))
    }
    val med = lowerMedian(v, "vc", "med_c")
    val dev = v.join(broadcast(med), Seq("event_type"))
      .withColumn("ad", abs(col("vc") - col("med_c")))
      // referenced twice (the MAD median pass + the final outlier
      // aggregate): uncached, the events scan + the median windows ran
      // once per branch (round-13 optimization pass)
      .localCheckpoint(false)
    val mad = lowerMedian(dev.select(col("event_type"), col("ad")),
      "ad", "mad_c")
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med_c")).as("median_centi"),
        max(col("mad_c")).as("mad_centi"),
        sum((col("ad") > lit(3L) * col("mad_c")).cast("long"))
          .as("n_outliers"))
      .withColumn("outlier_ppm", expr("n_outliers * 1000000 div n"))
  }

  private val madOutliersSql: String =
    """WITH v AS (SELECT event_type,
      |    CAST(ROUND(value * 100.0) AS BIGINT) AS vc FROM events),
      |g1 AS (SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) cnt
      |  FROM v GROUP BY 1, 2),
      |c1 AS (SELECT event_type, vc,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS UNBOUNDED PRECEDING) cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) n
      |  FROM g1),
      |med AS (SELECT event_type, MIN(CASE WHEN cum >= (n + 1) // 2
      |    THEN vc END) AS med_c FROM c1 GROUP BY 1),
      |dev AS (SELECT v.event_type, vc, med_c, ABS(vc - med_c) AS ad
      |  FROM v JOIN med ON v.event_type = med.event_type),
      |g2 AS (SELECT event_type, ad, CAST(COUNT(*) AS BIGINT) cnt
      |  FROM dev GROUP BY 1, 2),
      |c2 AS (SELECT event_type, ad,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY ad
      |      ROWS UNBOUNDED PRECEDING) cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) n
      |  FROM g2),
      |mad AS (SELECT event_type, MIN(CASE WHEN cum >= (n + 1) // 2
      |    THEN ad END) AS mad_c FROM c2 GROUP BY 1),
      |j AS (SELECT dev.event_type, dev.med_c, mad.mad_c, dev.ad
      |  FROM dev JOIN mad ON dev.event_type = mad.event_type)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
      |MAX(med_c) AS median_centi, MAX(mad_c) AS mad_centi,
      |CAST(SUM(CASE WHEN ad > 3 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_outliers,
      |CAST(SUM(CASE WHEN ad > 3 * mad_c THEN 1 ELSE 0 END) * 1000000
      |  // COUNT(*) AS BIGINT) AS outlier_ppm
      |FROM j GROUP BY 1""".stripMargin

  /** Incremental view maintenance of the daily revenue summary:
    * the order history is split at its date midpoint into a BASE
    * partial state and a DELTA partial state (the nightly increment);
    * each side partial-aggregates independently and the merge
    * combines the monoid states (count-sum, exact DECIMAL sum). The
    * oracle is the FULL rebuild — proving merged-partials ==
    * recompute, the contract an incremental refresh relies on.
    */
  def ivmDailySummary(orders: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val o = orders.select(to_date(col("o_orderdate")).as("od"),
      col("o_totalprice").cast(dec).as("price"))
    val mid = o.agg(min(col("od")).as("dmin"), max(col("od")).as("dmax"))
      .select(date_add(col("dmin"),
        floor(datediff(col("dmax"), col("dmin")) / lit(2)).cast("int"))
        .as("dmid"))
    val tagged = o.crossJoin(broadcast(mid))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("od"))
        .agg(count(lit(1)).as("pn"), sum(col("price")).as("psum"))
    val base = partial(tagged.filter(col("od") < col("dmid")))
    val delta = partial(tagged.filter(col("od") >= col("dmid")))
    base.unionAll(delta)
      .groupBy(col("od"))
      .agg(sum(col("pn")).as("n"),
        round(sum(col("psum")).cast("double"), 2).as("revenue"))
  }

  private val ivmDailySummarySql: String =
    """SELECT CAST(o_orderdate AS DATE) AS od,
      |CAST(COUNT(*) AS BIGINT) AS n,
      |ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
      |  AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  /** Deterministic global shuffle into training shards: each doc gets
    * a mod-prime mixing hash (two LCG rounds mod 1e9+7 — engine-exact
    * BIGINT arithmetic, no 64-bit wrap), shard = h mod NShards, and a
    * within-shard position. One shuffle; each shard is one writer
    * task, the standard pre-training materialization (shard count is
    * the scale knob — raise it with corpus size to bound task size).
    */
  val ShufflePrime: Long = 1000000007L
  val NShards: Int = 8

  def detShuffle(docs: DataFrame, nShards: Int = NShards): DataFrame = {
    val h1 = (col("doc_id") % lit(ShufflePrime)) * lit(1103515245L) +
      lit(12345L)
    val hashed = docs.select(col("doc_id"))
      .withColumn("h1", h1 % lit(ShufflePrime))
      .withColumn("h", (col("h1") * lit(69069L) + lit(1234567L)) %
        lit(ShufflePrime))
      .withColumn("shard", col("h") % lit(nShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    hashed.select(col("doc_id"), col("shard"),
      row_number().over(w).cast("long").as("pos"))
  }

  private val detShuffleSql: String =
    s"""WITH h AS (SELECT doc_id,
       |    ((doc_id % $ShufflePrime) * 1103515245 + 12345) % $ShufflePrime
       |      AS h1 FROM documents),
       |hh AS (SELECT doc_id, (h1 * 69069 + 1234567) % $ShufflePrime AS h
       |  FROM h)
       |SELECT doc_id, h % $NShards AS shard,
       |CAST(ROW_NUMBER() OVER (PARTITION BY h % $NShards
       |  ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM hh""".stripMargin

  /** k-anonymity audit over the customer table: quasi-identifier =
    * (market segment, nation, account-balance band). A release is
    * k-anonymous when every quasi-identifier group has ≥ k members;
    * the report counts violating groups and the rows they expose.
    * The balance band uses an offset-then-integer-divide (balances
    * can be negative; Spark `div` truncates toward zero while
    * DuckDB `//` floors, so the offset keeps the operand positive
    * where both agree). One grouped aggregate at quasi-ID grain +
    * a constant-size summary — scan bandwidth at any table size.
    */
  val KAnonK: Long = 10L
  val BalOffset: Long = 100000L // keeps the band operand positive

  def kAnonymity(customer: DataFrame, k: Long = KAnonK): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val groups = customer
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(s"(CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2))) AS BIGINT)" +
          s" + $BalOffset) div 1000").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("sz"))
    groups.agg(
      lit(k).as("k"),
      count(lit(1)).as("n_groups"),
      sum((col("sz") < lit(k)).cast("long")).as("n_violating"),
      sum(when(col("sz") < lit(k), col("sz")).otherwise(lit(0L)))
        .as("rows_at_risk"),
      min(col("sz")).as("min_group_size"))
  }

  private val kAnonymitySql: String =
    s"""WITH g AS (SELECT c_mktsegment, c_nationkey,
       |    (CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2))) AS BIGINT)
       |      + $BalOffset) // 1000 AS bal_band,
       |    CAST(COUNT(*) AS BIGINT) AS sz
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT CAST($KAnonK AS BIGINT) AS k,
       |CAST(COUNT(*) AS BIGINT) AS n_groups,
       |CAST(SUM(CASE WHEN sz < $KAnonK THEN 1 ELSE 0 END) AS BIGINT)
       |  AS n_violating,
       |CAST(SUM(CASE WHEN sz < $KAnonK THEN sz ELSE 0 END) AS BIGINT)
       |  AS rows_at_risk,
       |MIN(sz) AS min_group_size
       |FROM g""".stripMargin

  /** Benford first-significant-digit audit over order totals — the
    * classic fraud/synthetic-data screen: naturally occurring
    * multi-magnitude amounts follow P(d) = log10(1 + 1/d); fabricated
    * or truncated feeds don't. The expected shares are fixed
    * round-to-ppm literals (they sum to exactly 1e6), the observed
    * shares are exact integer floor-div ppm, and the per-digit
    * deviation is their absolute difference — no float anywhere, so
    * both engines emit identical rows. One aggregate at 9-digit
    * grain + a broadcast total: scan bandwidth at any table size.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  def benford(orders: DataFrame): DataFrame = {
    val amounts = orders
      .filter(col("o_totalprice") >= lit(1.0d))
      .select(substring(floor(col("o_totalprice")).cast("bigint")
        .cast("string"), 1, 1).cast("long").as("digit"))
    val obs = amounts.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = amounts.agg(count(lit(1)).as("total")) // 1 row
    val expected = BenfordPpm
      .map { case (d, p) => s"($d, ${p}L)" }
      .mkString("VALUES ", ", ", " AS t(digit, expected_ppm)")
    val exp = obs.sparkSession.sql(
      s"SELECT CAST(digit AS BIGINT) AS digit, expected_ppm FROM ($expected)")
    exp.join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(col("total") === 0L, lit(0L))
          .otherwise(expr("coalesce(n, 0L) * 1000000 div total"))
          .as("observed_ppm"),
        col("expected_ppm"))
      .withColumn("dev_ppm", abs(col("observed_ppm") - col("expected_ppm")))
  }

  private val benfordSql: String = {
    val values = BenfordPpm
      .map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH amt AS (SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders WHERE o_totalprice >= 1),
       |obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM amt
       |  GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM amt),
       |e(digit, expected_ppm) AS (VALUES $values)
       |SELECT CAST(e.digit AS BIGINT) AS digit,
       |COALESCE(obs.n, CAST(0 AS BIGINT)) AS n,
       |CASE WHEN total = 0 THEN CAST(0 AS BIGINT)
       |  ELSE CAST(COALESCE(obs.n, 0) * 1000000 // total AS BIGINT)
       |  END AS observed_ppm,
       |CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
       |CAST(ABS(CASE WHEN total = 0 THEN 0
       |  ELSE COALESCE(obs.n, 0) * 1000000 // total END
       |  - e.expected_ppm) AS BIGINT) AS dev_ppm
       |FROM e LEFT JOIN obs ON e.digit = obs.digit, tot""".stripMargin
  }

  /** Distinct l-diversity audit — k-anonymity's complement: a group
    * can be large (k-safe) yet still leak if every member shares one
    * sensitive value. Quasi-identifier = (market segment, nation);
    * sensitive attribute = the account-balance band (the attacker
    * model: segment+nation are linkable from the outside, balance is
    * the secret). A group is l-diverse when it contains ≥ l DISTINCT
    * sensitive values. One aggregate at quasi-ID grain (the exact
    * distinct adds the usual two-phase expand) + a constant summary.
    */
  val LDiversityL: Long = 5L

  def lDiversity(customer: DataFrame, l: Long = LDiversityL): DataFrame = {
    val groups = customer
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(s"(CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2))) AS BIGINT)" +
          s" + $BalOffset) div 1000").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("sz"),
        countDistinct(col("bal_band")).as("l_dist"))
    groups.agg(
      lit(l).as("l"),
      count(lit(1)).as("n_groups"),
      sum((col("l_dist") < lit(l)).cast("long")).as("n_violating"),
      sum(when(col("l_dist") < lit(l), col("sz")).otherwise(lit(0L)))
        .as("rows_at_risk"),
      min(col("l_dist")).as("min_l"))
  }

  private val lDiversitySql: String =
    s"""WITH g AS (SELECT c_mktsegment, c_nationkey,
       |    CAST(COUNT(*) AS BIGINT) AS sz,
       |    CAST(COUNT(DISTINCT (CAST(FLOOR(CAST(c_acctbal AS
       |      DECIMAL(18,2))) AS BIGINT) + $BalOffset) // 1000)
       |      AS BIGINT) AS l_dist
       |  FROM customer GROUP BY 1, 2)
       |SELECT CAST($LDiversityL AS BIGINT) AS l,
       |CAST(COUNT(*) AS BIGINT) AS n_groups,
       |CAST(SUM(CASE WHEN l_dist < $LDiversityL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS n_violating,
       |CAST(SUM(CASE WHEN l_dist < $LDiversityL THEN sz ELSE 0 END)
       |  AS BIGINT) AS rows_at_risk,
       |MIN(l_dist) AS min_l
       |FROM g""".stripMargin

  /** Size-balanced contiguous shard packing — the OTHER shard
    * materialization next to u11's hash shuffle: training-data export
    * wants shards of roughly equal BYTES in a stable document order
    * (contiguous doc-id runs keep source-locality and make resume
    * offsets trivial). shard = exclusive-prefix-bytes div target — the exact
    * greedy next-fit pack over the doc_id order.
    *
    * Scale shape: the global prefix sum uses the Stats.denseIndex
    * two-phase device — range-partition by doc_id, per-partition byte
    * totals, ONE bounded window over pid grain (≤ partition count, a
    * cluster config constant) for the offsets, then a partition-local
    * cumulative window. No data-sized window partition anywhere; the
    * result depends only on the global doc_id order, so it is
    * partition-count invariant (DeterminismSpec).
    */
  val ShardChars: Long = 65536L

  def shardPack(docs: DataFrame, target: Long = ShardChars): DataFrame = {
    val parts = docs.select(col("doc_id"), col("n_chars"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id().cast("long"))
      .localCheckpoint(false)
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy(col("pid"))
      .agg(sum(col("n_chars")).as("pbytes"))
      .withColumn("off", coalesce(sum(col("pbytes")).over(wOff), lit(0L)))
      .select(col("pid"), col("off"))
    val wIn = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts.join(broadcast(offs), Seq("pid"))
      .withColumn("cum_excl",
        col("off") + coalesce(sum(col("n_chars")).over(wIn), lit(0L)))
      .withColumn("shard", expr(s"cum_excl div $target"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("shard_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  private val shardPackSql: String =
    s"""WITH c AS (SELECT doc_id, n_chars,
       |    COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_excl
       |  FROM documents)
       |SELECT CAST(cum_excl // $ShardChars AS BIGINT) AS shard,
       |CAST(COUNT(*) AS BIGINT) AS n_docs,
       |CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
       |MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1""".stripMargin

  // ---- driver-contract registry ----

  /** DQ6: referential-integrity audit across the lake's FK edges —
    * the orphan monitor every warehouse runs after a load: child rows
    * whose parent key is missing (broken FK), and parents with no
    * children where children are expected (dead rows). Each edge is
    * one left-anti join on the key — at 100 TB these are the same
    * shuffles the production joins already pay, and the audit's
    * output is a constant few rows. A clean load reports zeros, which
    * IS the signal (the reference loads via truncate+insert with no
    * FK enforcement — daily_pipeline.py writes lineitem and orders
    * independently, so a partial failure leaves exactly these
    * orphans).
    */
  def refIntegrity(orders: DataFrame, lineitem: DataFrame,
                   customer: DataFrame): DataFrame = {
    def cnt(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    val liOrphans = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
    val emptyOrders = orders.select(col("o_orderkey"))
      .join(lineitem.select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
    val custOrphans = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
    cnt(liOrphans, "lineitem_without_order")
      .unionByName(cnt(emptyOrders, "order_without_lineitem"))
      .unionByName(cnt(custOrphans, "order_without_customer"))
  }

  private val refIntegritySql =
    """SELECT 'lineitem_without_order' AS check,
      |  CAST(COUNT(*) AS BIGINT) AS n_violations
      |FROM lineitem WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL
      |SELECT 'order_without_lineitem',
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders WHERE NOT EXISTS
      |  (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |UNION ALL
      |SELECT 'order_without_customer',
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders WHERE NOT EXISTS
      |  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin

  /** DQ7 (beyond-ref): join-cardinality explosion audit — the
    * pre-flight check for the classic 100 TB pipeline killer: a join
    * two tables share a key on turns out many-to-many and the output
    * is quadratic in the hot key's multiplicity. The audit prices the
    * join WITHOUT running it: per-side key-grain counts, then the
    * EXACT predicted output Σ_k ca(k)·cb(k), the worst single key's
    * pair volume, and the output-vs-larger-input amplification in
    * whole milli. Cost is two key-grain aggregates + a key-grain
    * join — the multiplicities move, never the rows.
    *
    * Overflow: per-key pairs and their sum route through DECIMAL(38)
    * before the BIGINT cast — two 10⁹-row hot sides predict 10¹⁸
    * pairs, exactly the case the audit exists to catch, and exactly
    * where naive Long math would wrap. Empty inputs emit the one
    * all-zero row (a monitor that vanishes when its subject is empty
    * pages nobody).
    */
  def joinExplosion(left: DataFrame, right: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val ca = left.groupBy(col("k")).agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col("k")).agg(count(lit(1)).as("cb"))
    val j = ca.join(cb, Seq("k"))
      .select((col("ca").cast(dec) * col("cb")).as("pairs"))
    val agg = j.agg(count(lit(1)).as("n_keys"),
      coalesce(sum(col("pairs")), lit(0L).cast(dec)).as("out_dec"),
      coalesce(max(col("pairs")), lit(0L).cast(dec)).as("max_dec"))
    val tl = left.agg(count(lit(1)).as("n_left"))
    val tr = right.agg(count(lit(1)).as("n_right"))
    tl.crossJoin(tr).crossJoin(agg)
      .select(col("n_left"), col("n_right"), col("n_keys"),
        col("out_dec").cast("long").as("out_rows"),
        col("max_dec").cast("long").as("max_key_pairs"),
        expr("case when greatest(n_left, n_right) = 0 then 0L else " +
          "cast((out_dec * 1000) div greatest(n_left, n_right) " +
          "as bigint) end").as("amplification_milli"))
  }

  private val joinExplosionSql =
    """WITH ca AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS ca
      |  FROM events GROUP BY 1),
      |cb AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
      |  FROM orders GROUP BY 1),
      |j AS (SELECT CAST(ca AS HUGEINT) * cb AS pairs
      |  FROM ca JOIN cb USING (k)),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    COALESCE(SUM(pairs), 0) AS out_dec,
      |    COALESCE(MAX(pairs), 0) AS max_dec
      |  FROM j),
      |tl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM events),
      |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM orders)
      |SELECT n_left, n_right, n_keys,
      |CAST(out_dec AS BIGINT) AS out_rows,
      |CAST(max_dec AS BIGINT) AS max_key_pairs,
      |CASE WHEN GREATEST(n_left, n_right) = 0 THEN CAST(0 AS BIGINT)
      |  ELSE CAST((out_dec * 1000) // GREATEST(n_left, n_right)
      |    AS BIGINT) END AS amplification_milli
      |FROM tl, tr, agg""".stripMargin

  /** DQ10: the schema-profiling pass every lake onboarding runs —
    * per column: non-null count, exact distinct cardinality, and
    * min/max rendered as strings (the Deequ/Great-Expectations
    * "profile" primitive that seeds the constraint suites above).
    * ONE scan: all per-column aggregates run in a single global
    * aggregate, then one `stack` unpivots to the long form.
    * `p21_profile` is the same verb in the per-column-UNION plan
    * (one pruned scan + one aggregate per column): column pruning
    * keeps the union's bytes comparable, but it plans ncols separate
    * scan stages where this runs one; the pair is a deliberate plan
    * A/B like the exact-vs-capped dedup twins.
    *
    * Scale note: the EXACT multi-column distinct plans one Expand
    * projection per distinct aggregate (scan × ncols rows into the
    * partial aggregate — the price of exactness, map-side combined);
    * at 100 TB the same plumbing takes approx_count_distinct (the
    * a10 HLL device) — exact here because the oracle compare needs
    * the exact number. min/max cast to string AFTER the typed
    * comparison, so ordering semantics stay native per type.
    */
  def profile(df: DataFrame): DataFrame = {
    val cs = df.columns.toSeq
    // Two 1-row aggregates, crossed: putting min/max(string) buffers
    // in the SAME aggregate as the multi-column distincts forces the
    // whole Expand (scan × ncols rows) through SortAggregate — a sort
    // on the expanded value columns (measured 6× this shape). Split,
    // the fold pass has NO grouping (SortAggregate without grouping
    // needs no Sort: a linear fold) and the distinct pass carries
    // only long buffers (HashAggregate end to end).
    val basic = df.agg(count(lit(1)).as("n_rows"),
      cs.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))): _*)
    val dist = df.agg(
      count_distinct(col(cs.head)).as(s"nd_${cs.head}"),
      cs.tail.map(c => count_distinct(col(c)).as(s"nd_$c")): _*)
    val stackArgs = cs
      .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    basic.crossJoin(dist) // 1-row × 1-row
      .select(col("n_rows"), expr(
        s"stack(${cs.size}, $stackArgs) as " +
          "(column_name, n_non_null, n_distinct, min_s, max_s)"))
  }

  /** Orders with the timestamp normalized to a date string, so the
    * profile's min/max render identically across engines. */
  private def ordProfiled(s: SparkSession, d: String): DataFrame =
    ord(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"),
      to_date(col("o_orderdate")).cast("string").as("o_orderdate"),
      col("o_orderpriority"))

  private val ProfileCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  private def profileSql: String = {
    val perCol = ProfileCols.map { c =>
      s"""SELECT n_rows, '$c' AS column_name,
         |CAST(COUNT($c) AS BIGINT) AS n_non_null,
         |CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |CAST(MIN($c) AS VARCHAR) AS min_s,
         |CAST(MAX($c) AS VARCHAR) AS max_s
         |FROM src, n GROUP BY n_rows""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH src AS (SELECT o_orderkey, o_custkey, o_orderstatus,
       |    o_totalprice,
       |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       |    o_orderpriority FROM orders),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM src)
       |$perCol""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    // DQ10: one-scan schema profile — see profile.
    QueryDef("dq_profile",
      (s, d) => profile(ordProfiled(s, d)), Some(profileSql)),
    QueryDef("dq_ref_integrity",
      (s, d) => refIntegrity(ord(s, d), Tables.lineitem(s, d),
        Tables.customer(s, d)),
      Some(refIntegritySql)),
    QueryDef("dq_expectations",
      (s, d) => dqExpectations(ord(s, d)), Some(dqExpectationsSql)),
    QueryDef("dq_k_anonymity",
      (s, d) => kAnonymity(Tables.customer(s, d)), Some(kAnonymitySql)),
    QueryDef("ops_ks_drift",
      (s, d) => ksDrift(ord(s, d)), Some(ksDriftSql)),
    QueryDef("dq_mad_outliers",
      (s, d) => madOutliers(ev(s, d)), Some(madOutliersSql)),
    QueryDef("ivm_daily_summary",
      (s, d) => ivmDailySummary(ord(s, d)), Some(ivmDailySummarySql)),
    QueryDef("u11_det_shuffle",
      (s, d) => detShuffle(docs(s, d)), Some(detShuffleSql)),
    // DQ7: the user-grain events⋈orders join is the lake's one
    // genuinely many-to-many edge — priced before anyone runs it.
    QueryDef("dq_join_explosion",
      (s, d) => joinExplosion(
        Tables.events(s, d).select(col("user_id").as("k")),
        ord(s, d).select(col("o_custkey").as("k"))),
      Some(joinExplosionSql)),
    // DQ8: Benford first-digit screen over the money column.
    QueryDef("dq_benford",
      (s, d) => benford(ord(s, d)), Some(benfordSql)),
    // DQ9: l-diversity beside DQ5's k-anonymity — group size is not
    // privacy when the sensitive value is constant within the group.
    QueryDef("dq_l_diversity",
      (s, d) => lDiversity(Tables.customer(s, d)), Some(lDiversitySql)),
    // U13: size-balanced contiguous shard packing (export planning);
    // the hash-shuffle shards are u11_det_shuffle.
    QueryDef("u13_shard_pack",
      (s, d) => shardPack(docs(s, d)), Some(shardPackSql)))
}
