package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Functions.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Customer/merchandising analytics over the order history — the
  * next ring of gold-layer marts around the reference's daily
  * summary / category / top-k aggregates (dags/daily_pipeline.py
  * gold step, :200-260): RFM segmentation, market-basket lift,
  * revenue trend slopes, recency-decayed popularity, statistical
  * outlier audit, and a blocked fuzzy-match (record-linkage) join.
  *
  * Scale design (100 TB):
  *  - every metric reduces facts to an entity grain (customer /
  *    part / brand / priority) in ONE partial+final aggregate, then
  *    does the statistics on the reduced relation;
  *  - percentile cutpoints come from value-grain cumulative windows
  *    (the p20_winsorize device), never a global row-grain ntile —
  *    |distinct values| per group, not |rows|, flows to the window;
  *  - basket pairs enumerate only within an order (bounded basket
  *    size — TPC-H ≤13, real carts similar), shuffled on the order
  *    key, never across orders;
  *  - fuzzy matching blocks on (lang, length-bucket, first token)
  *    equi-keys and verifies edit distance on candidates only — the
  *    classic record-linkage blocking shape, same candidates-then-
  *    verify discipline as the minhash/simhash dedup family;
  *  - cross-engine determinism: money flows through DECIMAL(18,2)
  *    (dsum), decay weights are exact powers of two, and every
  *    float expression is the same IEEE op sequence on both engines
  *    (correctly-rounded /,*,sqrt over exactly-cast aggregates).
  */
object Commerce {

  private def ord(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)

  private def li(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)

  /** 1 + (v>q1) + (v>q2) + (v>q3): value-threshold quartile score
    * (percentile_disc semantics — ties share a score, unlike ntile's
    * arbitrary row split; deterministic on any engine).
    */
  private def qscore(v: Column, q1: Column, q2: Column, q3: Column): Column =
    lit(1) + (v > q1).cast("int") + (v > q2).cast("int") +
      (v > q3).cast("int")

  /** RFM segmentation: per-customer recency (days since last order,
    * relative to the corpus max date), frequency (order count) and
    * monetary (exact decimal revenue), each scored into value-based
    * quartiles; output is the segment-grain rollup (≤64 rows at any
    * scale). Recency quartiles are inverted (most recent = 4) so all
    * three scores read "higher is better".
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
      to_date(col("o_orderdate")).as("od"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val mx = o.agg(max(col("od")).as("mxd")) // 1 row
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("od")).as("last_od"), count(lit(1)).as("freq"),
        sum(col("price")).as("monetary"))
      .crossJoin(broadcast(mx))
      .withColumn("recency", datediff(col("mxd"), col("last_od")))
      // monetary scores at DOLLAR grain: the cutpoint device is
      // value-grain, and exact-cent revenues are near-unique per
      // customer — at corpus scale that degenerates to |customers|
      // rows in one window; whole dollars bound the grain by the
      // price range instead
      .withColumn("mon_b", floor(col("monetary")).cast("long"))
      .localCheckpoint(false) // three cutpoint scans + the score scan
    val rc = Stats.quartileCuts(cust, "recency")
    val fc = Stats.quartileCuts(cust, "freq")
    val mc = Stats.quartileCuts(cust, "mon_b")
    cust.crossJoin(broadcast(rc)).crossJoin(broadcast(fc))
      .crossJoin(broadcast(mc))
      .withColumn("r_score", lit(5) - qscore(col("recency"),
        col("recency_q1"), col("recency_q2"), col("recency_q3")))
      .withColumn("f_score", qscore(col("freq"),
        col("freq_q1"), col("freq_q2"), col("freq_q3")))
      .withColumn("m_score", qscore(col("mon_b"),
        col("mon_b_q1"), col("mon_b_q2"), col("mon_b_q3")))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("monetary")).as("revenue"))
  }

  /** Market-basket association mining: support / confidence / lift
    * for part pairs co-purchased in one order. One (order) shuffle
    * builds the sorted distinct basket array; pairs then generate
    * at scan bandwidth from the array (bounded by basket size² —
    * TPC-H ≤13, real carts similar) instead of an order-key
    * self-join, which would shuffle the item relation twice more.
    * Per-item counts broadcast onto the pair relation; output is
    * the top-k by co-occurrence with a unique (n_ab desc, i, j)
    * total order.
    */
  def basketLift(lineitem: DataFrame, k: Int = 100): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("pid"))
      .groupBy(col("oid"))
      .agg(sort_array(collect_set(col("pid"))).as("ps"))
      .localCheckpoint(false) // feeds pairs, item counts, order count
    val nOrders = baskets.agg(count(lit(1)).as("n_orders")) // 1 row
    val icnt = baskets.select(explode(col("ps")).as("pid"))
      .groupBy(col("pid")).agg(count(lit(1)).as("n_i"))
    val pairs = baskets.select(explode(expr(
        """flatten(transform(ps, (x, ix) ->
          |  transform(slice(ps, ix + 2, size(ps) - ix - 1),
          |    y -> named_struct('i', x, 'j', y))))""".stripMargin))
        .as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(icnt.select(col("pid").as("i"),
        col("n_i").as("n_a"))), Seq("i"))
      .join(broadcast(icnt.select(col("pid").as("j"),
        col("n_i").as("n_b"))), Seq("j"))
      .crossJoin(broadcast(nOrders))
      .select(col("i"), col("j"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("i"), col("j"))
      .limit(k)
  }

  /** Per-brand weekly revenue trend: least-squares slope of weekly
    * revenue over the week index, from exact sufficient statistics
    * (counts, integer week sums, decimal revenue sums) — the only
    * float ops are the final casts and one (num/den) division,
    * identical IEEE sequences on both engines. Output is |brands|
    * rows at any scale; facts reduce in one (brand, week) aggregate.
    */
  def trendSlope(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val weekly = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        expr("datediff(to_date(l_shipdate), date'1970-01-01') div 7")
          .as("wk"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("rev"))
      .groupBy(col("brand"), col("wk"))
      .agg(sum(col("rev")).as("rev"))
    weekly.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_weeks"),
        sum(col("wk")).as("sx"),
        sum(col("rev")).cast("double").as("sy"),
        sum(col("wk") * col("rev")).cast("double").as("sxy"),
        sum(col("wk") * col("wk")).as("sxx"))
      // a single-week brand has no slope: the denominator is exactly
      // 0 and engines disagree on 0/0 (Spark NaN, DuckDB NULL)
      .filter(col("n_weeks") >= 2)
      .select(col("brand"), col("n_weeks"),
        round((col("n_weeks").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")) /
          (col("n_weeks") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("slope_per_week"))
  }

  /** Recency-decayed part popularity: each sale contributes
    * 0.5^age_months (30-day buckets against the corpus max ship
    * date, clamped at 40 half-lives). 2^-m is exactly representable,
    * so floor(1e6·2^-m) micro-units sum as exact BIGINTs in any
    * order on any engine (the txt_unigram_logprob quantization, with
    * an exact weight instead of a log). Top-k by (score desc, part).
    */
  def decayTopk(lineitem: DataFrame, k: Int = 100): DataFrame = {
    val sales = lineitem.select(col("l_partkey").as("part_id"),
      to_date(col("l_shipdate")).as("sd"))
    val mx = sales.agg(max(col("sd")).as("mxd")) // 1 row
    sales.crossJoin(broadcast(mx))
      .withColumn("age_m",
        least(expr("datediff(mxd, sd) div 30"), lit(40)))
      .withColumn("wq",
        floor(pow(lit(0.5), col("age_m")) * lit(1000000.0)))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_sales"), sum(col("wq")).as("score_q"))
      .withColumn("score",
        round(col("score_q").cast("double") / 1000000.0, 6))
      .orderBy(col("score_q").desc, col("part_id")) // unquantized cut key
      .limit(k)
      .select(col("part_id"), col("n_sales"), col("score"))
  }

  /** Statistical outlier audit: events whose value sits >3σ from
    * their event-type mean. Values quantize to centi-units
    * (floor(x·100) — one IEEE multiply + floor, identical on any
    * engine) so the per-class moments (n, Σx, Σx² — the square sum
    * in DECIMAL(38,0)) are exact integers summed in any order; mean,
    * σ and the z comparison are then the same correctly-rounded
    * double sequence on both engines, so the flag can't flake.
    * Output is the outlier rows (audit-sized for well-behaved tails).
    */
  def outliers(events: DataFrame): DataFrame = {
    val rows = events.select(col("event_id"),
      col("event_type"), col("value"),
      floor(col("value") * lit(100.0)).as("xq"))
    val mom = rows.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal sums: exact at any row count (long would wrap at
        // ~1e12 rows of 1e6-unit values; DuckDB's SUM is HUGEINT)
        sum(col("xq").cast(DecimalType(38, 0))).cast("double").as("sy"),
        sum(col("xq").cast(DecimalType(28, 0)) * col("xq"))
          .cast("double").as("syy"))
      // a singleton class has no sample variance: its 0/0 is NULL on
      // Spark but NaN on DuckDB (whose total float order passes > 0)
      .filter(col("n") >= 2)
      .select(col("event_type"),
        (col("sy") / col("n")).as("mean"),
        // greatest(0): near-constant classes can round n·Σx² − (Σx)²
        // slightly negative in doubles; Spark would NaN-drop rows but
        // DuckDB hard-errors on sqrt(negative) — guard both engines
        sqrt(greatest((col("n") * col("syy") - col("sy") * col("sy")) /
          (col("n").cast("double") * (col("n") - lit(1))), lit(0.0)))
          .as("sd"))
    rows.join(broadcast(mom), Seq("event_type"))
      .withColumn("z",
        (col("xq").cast("double") - col("mean")) / col("sd"))
      .filter(col("sd") > 0.0 && abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z"))
  }

  /** Maximum members per block in blockedMatch — block purging, the
    * record-linkage analog of Dedup's stop-shingle df cap: a block
    * bigger than this is too generic to discriminate, and its pair
    * space (size²) is exactly what must not reach the join at 100 TB.
    * (Current data maxes at 14; the cap is the insurance, not the
    * tuning.)
    */
  val MaxBlock = 100

  /** Blocked fuzzy match (record linkage) over documents: block on
    * the cheap equi-keys (lang, 50-char length bucket, first token),
    * verify candidates with edit distance over a 60-char prefix.
    * Candidates come from an equi-join on the block key — never a
    * pair scan; oversize blocks are purged (MaxBlock) so no key can
    * contribute more than MaxBlock² candidate pairs; the O(len²)
    * levenshtein runs only on the bounded prefix of survivors.
    */
  /** ER4 (round 13 continuation): blocking-quality monitor — pair
    * completeness and reduction ratio, the two standard blocking
    * metrics (Christen, Data Matching 2012 §7): of the TRUE match
    * pairs, how many does the (lang, length-band, first-token) scheme
    * keep as candidates (PC — blocking's recall, what dedup_lsh_recall
    * is to the MinHash index), and what fraction of the all-pairs
    * budget does it avoid (RR). The ground truth is the UNBLOCKED
    * match relation — quadratic by definition — so it runs on a
    * FIXED-SIZE deterministic sample (md5-ordered first `ErSample`
    * docs): monitor cost is corpus-size-INDEPENDENT by construction
    * (the sim_* fixed-query-batch device, one rung stronger than the
    * fractional monitor sample, whose cross pairs would still grow
    * quadratically with the corpus). Block sizes and the MaxBlock
    * purge are evaluated WITHIN the sample, so the row is a
    * self-contained read on the scheme, not on corpus skew. One row,
    * integer ppm ratios.
    */
  val ErSample = 300

  def blockQuality(docs: DataFrame, maxDist: Int = 5,
                   maxBlock: Int = MaxBlock): DataFrame = {
    val sample = docs.select(col("doc_id"), col("lang"),
        expr("n_chars div 50").as("lb"),
        split_part(col("text"), lit(" "), lit(1)).as("tok1"),
        regexp_replace(substring(col("text"), 1, 60), "[^ -~]", "#")
          .as("pre"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(ErSample)
      .localCheckpoint(false) // truth cross, block sizes, candidates
    val truth = sample.as("a").join(sample.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          levenshtein(col("a.pre"), col("b.pre")) <= maxDist)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .localCheckpoint(false) // the count + the caught semi-join
    val sized = sample.join(
        sample.groupBy(col("lang"), col("lb"), col("tok1"))
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= maxBlock).drop("bsz"),
        Seq("lang", "lb", "tok1"), "left_semi")
    val cand = sized.as("a").join(sized.as("b"),
        col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
          col("a.tok1") === col("b.tok1") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .localCheckpoint(false) // the count + the caught semi-join
    sample.agg(count(lit(1)).as("n_docs"))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(truth.join(cand, Seq("i", "j"), "left_semi")
        .agg(count(lit(1)).as("n_caught")))
      .withColumn("total_pairs", expr("n_docs * (n_docs - 1) div 2"))
      .withColumn("pc_ppm", when(col("n_true") > 0,
        expr("n_caught * 1000000 div n_true")))
      .withColumn("rr_ppm", when(col("total_pairs") > 0,
        expr("(total_pairs - n_candidates) * 1000000 div total_pairs")))
      .select(col("n_docs"), col("total_pairs"), col("n_candidates"),
        col("n_true"), col("n_caught"), col("pc_ppm"), col("rr_ppm"))
  }

  def blockedMatch(docs: DataFrame, maxDist: Int = 5,
                   maxBlock: Int = MaxBlock): DataFrame = {
    // non-ASCII is projected to '#' before the distance: Spark's
    // levenshtein counts code points, DuckDB's counts BYTES — on the
    // ASCII projection they are the same function. '[^ -~]' (outside
    // printable ASCII) parses identically in Java regex and RE2.
    val p = docs.select(col("doc_id"), col("lang"),
        expr("n_chars div 50").as("lb"),
        split_part(col("text"), lit(" "), lit(1)).as("tok1"),
        regexp_replace(substring(col("text"), 1, 60), "[^ -~]", "#")
          .as("pre"))
      .localCheckpoint(false) // feeds the block sizes AND the semi join
    val sized = p.join(
        p.groupBy(col("lang"), col("lb"), col("tok1"))
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= maxBlock)
          .drop("bsz"),
        Seq("lang", "lb", "tok1"), "left_semi")
      .localCheckpoint(false) // both sides of the self-join below
    sized.as("a").join(sized.as("b"),
        col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
          col("a.tok1") === col("b.tok1") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        levenshtein(col("a.pre"), col("b.pre")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Cohort lifetime-value triangle: customers grouped by first-order
    * month, revenue accumulated per months-since-acquisition — the
    * money twin of the e4 retention triangle and the standard LTV
    * read-out. Facts reduce to (cohort, offset) grain in one
    * aggregate; the cumulative sum windows over the triangle itself
    * (|cohorts| × |offsets| rows, constant-ish at any fact scale);
    * LTV-per-customer divides exact decimal by exact count.
    */
  def cohortLtv(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .as("midx"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val firstM = o.groupBy(col("o_custkey"))
      .agg(min(col("midx")).as("cohort"))
    val sized = firstM.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val tri = o.join(firstM, Seq("o_custkey"))
      .groupBy(col("cohort"), (col("midx") - col("cohort")).as("month_offset"))
      .agg(sum(col("price")).as("rev"))
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tri
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .join(broadcast(sized), Seq("cohort"))
      .select(col("cohort"), col("month_offset"), col("cohort_size"),
        round(col("rev").cast("double"), 2).as("revenue"),
        // floor-division in exact cents: ROUND of the double ratio
        // can land on a .xx5 halfway case where engines disagree
        (expr("CAST(cum_rev * 100 AS BIGINT) div cohort_size")
          .cast("double") / 100.0).as("ltv_per_customer"))
  }

  /** ER3: golden-record consolidation — the end of the record-linkage
    * pipeline the blocked fuzzy match begins: match pairs → connected
    * components (Dedup's pointer-jumping machinery, log-depth) → one
    * merged master row per entity cluster, with the longest-text
    * member as the survivor (ties to the lower doc_id — the
    * dedup_best_of_cluster rule) and merged attributes read off the
    * cluster. Composition of three audited-safe pieces; the only new
    * operation is one cluster-keyed rank window + one aggregate.
    */
  def goldenRecords(docs: DataFrame): DataFrame = {
    val pairs = blockedMatch(docs).select(col("i"), col("j"))
    val labeled = Dedup.labelComponents(pairs, docs.select(col("doc_id")))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(labeled.select(col("doc_id"),
        col("canonical_id").as("cluster_id")), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(max(when(col("rk") === 1, col("doc_id"))).as("golden_id"),
        count(lit(1)).as("n_members"),
        max(when(col("rk") === 1, col("n_chars"))).as("golden_chars"),
        countDistinct(col("lang")).as("n_langs"))
  }

  val PsiBinWidth = 50000.0
  val PsiBins = 10

  /** Population-stability-index input-drift monitor over the order-
    * value distribution — the standard MLOps drift alarm (PSI > 0.25
    * = investigate/retrain) the reference's monitoring tier implies
    * but never materializes: the date range splits at its midpoint
    * into reference and current windows, values bin into fixed-width
    * bands, and each band contributes (p_ref − p_cur)·ln(p_ref/p_cur)
    * with add-one smoothing over the fixed band count keeping empty
    * bands finite. One scan → one ≤PsiBins-row aggregate; the date
    * midpoint and the side totals are 1-row broadcasts; shares and
    * the single ln run on fixed-shape doubles over exact integer
    * counts, micro-unit-quantized at emission (sum of psi_ppm / 1e6
    * is the headline PSI).
    */
  def driftPsi(orders: DataFrame): DataFrame = {
    val o = orders.select(to_date(col("o_orderdate")).as("od"),
      col("o_totalprice").cast("double").as("v"))
    val mid = o.agg(min(col("od")).as("dmin"), max(col("od")).as("dmax"))
      .select(date_add(col("dmin"),
        floor(datediff(col("dmax"), col("dmin")) / lit(2)).cast("int"))
        .as("dmid"))
    val counts = o.crossJoin(broadcast(mid))
      .withColumn("bin",
        least(floor(col("v") / lit(PsiBinWidth)), lit((PsiBins - 1).toLong)))
      .withColumn("cur", (col("od") >= col("dmid")).cast("long"))
      .groupBy(col("bin"))
      .agg(sum(lit(1L) - col("cur")).as("n_ref"),
        sum(col("cur")).as("n_cur"))
    val tot = counts.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p_ref", (col("n_ref") + lit(1L)).cast("double") /
        (col("t_ref") + lit(PsiBins.toLong)).cast("double"))
      .withColumn("p_cur", (col("n_cur") + lit(1L)).cast("double") /
        (col("t_cur") + lit(PsiBins.toLong)).cast("double"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref") * lit(1000000.0d)).cast("long")
          .as("share_ref_ppm"),
        round(col("p_cur") * lit(1000000.0d)).cast("long")
          .as("share_cur_ppm"),
        round((col("p_ref") - col("p_cur"))
          * log(col("p_ref") / col("p_cur")) * lit(1000000.0d))
          .cast("long").as("psi_ppm"))
  }

  /** BI8: day-of-week seasonality index of order volume — the weekly
    * pattern every staffing/forecast dashboard starts from. The DOW
    * is pure integer calendar arithmetic (epoch-day mod 7, 0 =
    * Thursday), sidestepping engine dayofweek() convention skew; the
    * index is exact integer ppm of (per-day-of-week daily mean) /
    * (overall daily mean), i.e. n_orders·t_days·10⁶ div
    * (n_days·t_orders) — the Long products stay exact to ~10⁹ orders
    * (3.8e18 < 2⁶³); beyond that the same expression moves to
    * DECIMAL(38). One dow-grain aggregate + a 1-row broadcast.
    */
  def dowSeasonality(orders: DataFrame): DataFrame = {
    val base = orders.select(
      expr("((datediff(cast(o_orderdate as date), date '1970-01-01') % 7)" +
        " + 7) % 7").as("dow"),
      to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
    val perDow = base.groupBy(col("dow"))
      .agg(countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
    val tot = perDow.agg(sum(col("n_days")).as("t_days"),
      sum(col("n_orders")).as("t_orders"))
    perDow.crossJoin(broadcast(tot))
      .select(col("dow").cast("long").as("dow"), col("n_days"),
        col("n_orders"), col("revenue"),
        expr("n_orders * t_days * 1000000 div (n_days * t_orders)")
          .as("index_ppm"))
  }

  private val dowSeasonalitySql =
    """WITH b AS (SELECT
      |    ((datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      % 7) + 7) % 7 AS dow,
      |    CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders),
      |pd AS (SELECT dow, COUNT(DISTINCT day) AS n_days,
      |    COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS revenue
      |  FROM b GROUP BY 1),
      |t AS (SELECT SUM(n_days) AS t_days, SUM(n_orders) AS t_orders
      |  FROM pd)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(n_days AS BIGINT) AS n_days,
      |CAST(n_orders AS BIGINT) AS n_orders, revenue,
      |CAST(CAST(n_orders AS HUGEINT) * t_days * 1000000
      |  // (CAST(n_days AS HUGEINT) * t_orders) AS BIGINT) AS index_ppm
      |FROM pd, t""".stripMargin

  /** BI8 (beyond-ref): demand elasticity against the discount ladder —
    * per brand, the least-squares slope of ln(quantity sold) on
    * ln(price multiplier), over the DISCRETE discount levels (TPC-H
    * discounts are whole percents, so the x-grain is ≤ ~11 points —
    * a domain, never row count). Elasticity ≈ −2 means a 1% price cut
    * lifts volume ~2%; the promotions dashboard read. Device chain:
    * discount → integer percent (one IEEE multiply + round, identical
    * on both engines), quantities sum exactly, both logs quantize to
    * micro-nats, the slope is exact-integer sufficient statistics +
    * ONE double division (trendSlope's closed form). One (brand,
    * pct) aggregate — scan bandwidth — then a |brands|-row reduce.
    */
  def priceElasticity(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pts = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        round(col("l_discount") * lit(100.0d)).cast("long").as("dpct"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("brand"), col("dpct"))
      .agg(sum(col("q")).as("qty"))
      .select(col("brand"),
        round(log((lit(100L) - col("dpct")).cast("double")) * 1000000.0d)
          .cast("long").as("qx"),
        round(log(col("qty").cast("double")) * 1000000.0d).cast("long")
          .as("qy"))
    pts.groupBy(col("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("qx")).as("sx"), sum(col("qy")).as("sy"),
        sum(col("qx").cast(dec) * col("qx")).as("sxx"),
        sum(col("qx").cast(dec) * col("qy")).as("sxy"))
      .withColumn("den",
        col("sxx") * col("n") - col("sx").cast(dec) * col("sx"))
      .filter(col("n") >= 2 && col("den") > 0)
      .select(col("brand"), col("n").as("n_points"),
        round((col("sxy") * col("n") - col("sx").cast(dec) * col("sy"))
          .cast("double") / col("den").cast("double"), 6)
          .as("elasticity"))
  }

  private val priceElasticitySql: String =
    """WITH pts AS (SELECT p_brand AS brand,
      |    CAST(ROUND(l_discount * 100.0) AS BIGINT) AS dpct,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |q AS (SELECT brand,
      |    CAST(ROUND(ln(CAST(100 - dpct AS DOUBLE)) * 1000000.0)
      |      AS BIGINT) AS qx,
      |    CAST(ROUND(ln(CAST(qty AS DOUBLE)) * 1000000.0)
      |      AS BIGINT) AS qy FROM pts),
      |st AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
      |    SUM(CAST(qx AS HUGEINT) * qx) AS sxx,
      |    SUM(CAST(qx AS HUGEINT) * qy) AS sxy
      |  FROM q GROUP BY 1),
      |v AS (SELECT *, sxx * n - CAST(sx AS HUGEINT) * sx AS den
      |  FROM st)
      |SELECT brand, n AS n_points,
      |ROUND(CAST(sxy * n - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |  / CAST(den AS DOUBLE), 6) AS elasticity
      |FROM v WHERE n >= 2 AND den > 0""".stripMargin

  // ---- driver-contract registry ----

  val defs: Seq[QueryDef] = Seq(

    // BI8 (beyond-ref): discount-ladder demand elasticity — see
    // priceElasticity for the quantized-log closed form.
    QueryDef("bi_price_elasticity",
      (s, d) => priceElasticity(li(s, d), Tables.part(s, d)),
      Some(priceElasticitySql)),

    QueryDef("bi_dow_seasonality",
      (s, d) => dowSeasonality(ord(s, d)),
      Some(dowSeasonalitySql)),

    QueryDef("ops_drift_psi",
      (s, d) => driftPsi(ord(s, d)),
      Some(s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) od,
              |    CAST(o_totalprice AS DOUBLE) v FROM orders),
              |mid AS (SELECT MIN(od) + CAST(FLOOR(
              |    date_diff('day', MIN(od), MAX(od)) / 2) AS INT) AS dmid
              |  FROM o),
              |c AS (SELECT LEAST(FLOOR(v / $PsiBinWidth),
              |      CAST(${PsiBins - 1} AS DOUBLE)) AS bin,
              |    CAST(SUM(CASE WHEN od >= dmid THEN 0 ELSE 1 END) AS BIGINT) n_ref,
              |    CAST(SUM(CASE WHEN od >= dmid THEN 1 ELSE 0 END) AS BIGINT) n_cur
              |  FROM o, mid GROUP BY 1),
              |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) t_ref,
              |  CAST(SUM(n_cur) AS BIGINT) t_cur FROM c),
              |p AS (SELECT bin, n_ref, n_cur,
              |    CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + $PsiBins AS DOUBLE) p_ref,
              |    CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + $PsiBins AS DOUBLE) p_cur
              |  FROM c, t)
              |SELECT CAST(bin AS BIGINT) bin, n_ref, n_cur,
              |CAST(ROUND(p_ref * 1000000.0) AS BIGINT) share_ref_ppm,
              |CAST(ROUND(p_cur * 1000000.0) AS BIGINT) share_cur_ppm,
              |CAST(ROUND((p_ref - p_cur) * ln(p_ref / p_cur) * 1000000.0)
              |  AS BIGINT) psi_ppm
              |FROM p""".stripMargin)),

    QueryDef("bi_cohort_ltv",
      (s, d) => cohortLtv(ord(s, d)),
      Some("""WITH o AS (SELECT o_custkey,
             |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT)
             |      AS midx,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
             |firstm AS (SELECT o_custkey, MIN(midx) AS cohort
             |  FROM o GROUP BY 1),
             |sized AS (SELECT cohort, CAST(COUNT(*) AS BIGINT)
             |    AS cohort_size FROM firstm GROUP BY 1),
             |tri AS (SELECT cohort, midx - cohort AS month_offset,
             |    CAST(SUM(price) AS DECIMAL(18,2)) AS rev
             |  FROM o JOIN firstm USING (o_custkey) GROUP BY 1, 2),
             |c AS (SELECT cohort, month_offset, rev,
             |    SUM(rev) OVER (PARTITION BY cohort ORDER BY month_offset
             |      ROWS UNBOUNDED PRECEDING) AS cum_rev
             |  FROM tri)
             |SELECT cohort, month_offset, cohort_size,
             |ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
             |CAST(CAST(cum_rev * 100 AS BIGINT) // cohort_size AS DOUBLE)
             |  / 100.0 AS ltv_per_customer
             |FROM c JOIN sized USING (cohort)""".stripMargin)),

    QueryDef("bi_rfm_segments",
      (s, d) => rfmSegments(ord(s, d)),
      Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
             |cust AS (SELECT o_custkey, MAX(od) AS last_od,
             |    CAST(COUNT(*) AS BIGINT) AS freq,
             |    CAST(SUM(price) AS DECIMAL(18,2)) AS monetary,
             |    CAST(FLOOR(CAST(SUM(price) AS DECIMAL(18,2))) AS BIGINT)
             |      AS mon_b,
             |    date_diff('day', MAX(od), (SELECT MAX(od) FROM o))
             |      AS recency
             |  FROM o GROUP BY 1),
             |rcut AS (SELECT MIN(CASE WHEN cum >= CAST(ceil(0.25*n) AS BIGINT) THEN v END) q1,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.50*n) AS BIGINT) THEN v END) q2,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.75*n) AS BIGINT) THEN v END) q3
             |  FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) cum,
             |      SUM(cnt) OVER () n
             |    FROM (SELECT recency v, COUNT(*) cnt FROM cust GROUP BY 1))),
             |fcut AS (SELECT MIN(CASE WHEN cum >= CAST(ceil(0.25*n) AS BIGINT) THEN v END) q1,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.50*n) AS BIGINT) THEN v END) q2,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.75*n) AS BIGINT) THEN v END) q3
             |  FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) cum,
             |      SUM(cnt) OVER () n
             |    FROM (SELECT freq v, COUNT(*) cnt FROM cust GROUP BY 1))),
             |mcut AS (SELECT MIN(CASE WHEN cum >= CAST(ceil(0.25*n) AS BIGINT) THEN v END) q1,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.50*n) AS BIGINT) THEN v END) q2,
             |    MIN(CASE WHEN cum >= CAST(ceil(0.75*n) AS BIGINT) THEN v END) q3
             |  FROM (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) cum,
             |      SUM(cnt) OVER () n
             |    FROM (SELECT mon_b v, COUNT(*) cnt FROM cust GROUP BY 1)))
             |SELECT 5 - (1 + CAST(recency > rcut.q1 AS INT)
             |    + CAST(recency > rcut.q2 AS INT)
             |    + CAST(recency > rcut.q3 AS INT)) AS r_score,
             |  1 + CAST(freq > fcut.q1 AS INT) + CAST(freq > fcut.q2 AS INT)
             |    + CAST(freq > fcut.q3 AS INT) AS f_score,
             |  1 + CAST(mon_b > mcut.q1 AS INT) + CAST(mon_b > mcut.q2 AS INT)
             |    + CAST(mon_b > mcut.q3 AS INT) AS m_score,
             |  CAST(COUNT(*) AS BIGINT) AS n_customers,
             |  CAST(CAST(SUM(monetary) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
             |FROM cust, rcut, fcut, mcut
             |GROUP BY 1, 2, 3""".stripMargin)),

    QueryDef("bi_basket_lift",
      (s, d) => basketLift(li(s, d)),
      Some("""WITH items AS (SELECT DISTINCT l_orderkey AS oid,
             |    l_partkey AS pid FROM lineitem),
             |no AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n_orders
             |  FROM items),
             |icnt AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_i
             |  FROM items GROUP BY 1),
             |pairs AS (SELECT x.pid AS i, y.pid AS j,
             |    CAST(COUNT(*) AS BIGINT) AS n_ab
             |  FROM items x JOIN items y
             |    ON x.oid = y.oid AND x.pid < y.pid
             |  GROUP BY 1, 2)
             |SELECT i, j, n_ab,
             |ROUND(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
             |ROUND(CAST(n_ab AS DOUBLE) / a.n_i, 6) AS confidence,
             |ROUND(CAST(n_ab AS DOUBLE) * n_orders / (a.n_i * b.n_i), 6)
             |  AS lift
             |FROM pairs
             |JOIN icnt a ON pairs.i = a.pid
             |JOIN icnt b ON pairs.j = b.pid
             |CROSS JOIN no
             |ORDER BY n_ab DESC, i, j LIMIT 100""".stripMargin)),

    QueryDef("bi_trend_slope",
      (s, d) => trendSlope(li(s, d), Tables.part(s, d)),
      Some("""WITH weekly AS (SELECT p_brand AS brand,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) // 7 AS wk,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             |      AS DECIMAL(18,2)) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |st AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_weeks,
             |    CAST(SUM(wk) AS BIGINT) AS sx,
             |    CAST(SUM(rev) AS DOUBLE) AS sy,
             |    CAST(SUM(wk * rev) AS DOUBLE) AS sxy,
             |    CAST(SUM(wk * wk) AS BIGINT) AS sxx
             |  FROM weekly GROUP BY 1 HAVING COUNT(*) >= 2)
             |SELECT brand, n_weeks,
             |ROUND((CAST(n_weeks AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |  / CAST(n_weeks * sxx - sx * sx AS DOUBLE), 6)
             |  AS slope_per_week
             |FROM st""".stripMargin)),

    QueryDef("bi_decay_topk",
      (s, d) => decayTopk(li(s, d)),
      Some("""WITH sales AS (SELECT l_partkey AS part_id,
             |    CAST(l_shipdate AS DATE) AS sd FROM lineitem),
             |mx AS (SELECT MAX(sd) AS mxd FROM sales),
             |w AS (SELECT part_id,
             |    CAST(FLOOR(power(0.5,
             |      LEAST(date_diff('day', sd, mxd) // 30, 40)) * 1000000.0)
             |      AS BIGINT) AS wq
             |  FROM sales, mx)
             |SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_sales,
             |ROUND(CAST(SUM(wq) AS DOUBLE) / 1000000.0, 6) AS score
             |FROM w GROUP BY 1
             |ORDER BY SUM(wq) DESC, part_id LIMIT 100""".stripMargin)),

    // Year-over-year growth per brand — the trend-slope's BI sibling
    // (slope says direction inside a year; YoY compares seasons
    // honestly). One (brand, year) aggregate, a lag window over the
    // |brands|×|years| grain, exact-decimal ratio rounded once.
    // ABC / Pareto analysis: parts classified by cumulative revenue
    // share (A carries the first 80%, B to 95%, C the tail) — the
    // inventory-policy classic. The naive plan is ONE unpartitioned
    // cumulative window over the whole part catalog — a single-task
    // sort that dies at a few million parts — so the cumulation is
    // BANDED by whole-unit revenue bucket (the Stats.valueCuts
    // value-grain device): floor() is monotone, so buckets are
    // contiguous under the rev-desc order and the global prefix sum
    // decomposes exactly into (sum of strictly-higher buckets) +
    // (within-bucket prefix). The only unpartitioned windows left
    // run over the BUCKET grain (bounded by the value domain, not
    // the catalog); the part-grain window is partitioned by bucket.
    // All sums are exact decimals, so the decomposition is
    // bit-identical to the single-window plan, and the class
    // boundaries stay exact integer comparisons (cum·5 ≤ total·4).
    QueryDef("bi_abc_analysis",
      (s, d) => {
        val byPart = li(s, d)
          .groupBy(col("l_partkey").as("part_id"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .as("rev"))
          .withColumn("b", floor(col("rev")).cast("long"))
        val bt = byPart.groupBy(col("b")).agg(sum(col("rev")).as("brev"))
        val wb = Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val off = bt
          .withColumn("cumb", sum(col("brev")).over(wb))
          .withColumn("total",
            sum(col("brev")).over(Window.partitionBy(lit(1))))
          .select(col("b"), (col("cumb") - col("brev")).as("boff"),
            col("total"))
        val wIn = Window.partitionBy(col("b"))
          .orderBy(col("rev").desc, col("part_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byPart.join(off, Seq("b"))
          .withColumn("cum", col("boff") + sum(col("rev")).over(wIn))
          .withColumn("abc_class",
            when(col("cum") * 5 <= col("total") * 4, "A")
              .when(col("cum") * 20 <= col("total") * 19, "B")
              .otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_parts"), dsum(col("rev")).as("revenue"))
      },
      Some("""WITH byp AS (SELECT l_partkey AS part_id,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             |      AS DECIMAL(18,2)) AS rev
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT part_id, rev,
             |    SUM(rev) OVER (ORDER BY rev DESC, part_id
             |      ROWS UNBOUNDED PRECEDING) AS cum,
             |    SUM(rev) OVER () AS total
             |  FROM byp),
             |k AS (SELECT rev,
             |    CASE WHEN cum * 5 <= total * 4 THEN 'A'
             |      WHEN cum * 20 <= total * 19 THEN 'B'
             |      ELSE 'C' END AS abc_class
             |  FROM c)
             |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
             |CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
             |FROM k GROUP BY 1""".stripMargin)),

    QueryDef("bi_yoy_growth",
      (s, d) => {
        val yearly = li(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            year(col("l_shipdate")).as("yr"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .as("rev"))
        val w = Window.partitionBy(col("brand")).orderBy(col("yr"))
        yearly
          .withColumn("prev_rev", lag(col("rev"), 1).over(w))
          .select(col("brand"), col("yr"),
            round(col("rev").cast("double"), 2).as("revenue"),
            when(col("prev_rev") > 0, round(
              (col("rev") - col("prev_rev")).cast("double")
                / col("prev_rev").cast("double"), 6))
              .as("yoy_growth"))
      },
      Some("""WITH yearly AS (SELECT p_brand AS brand,
             |    CAST(year(l_shipdate) AS INT) AS yr,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             |      AS DECIMAL(18,2)) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |l AS (SELECT brand, yr, rev,
             |    lag(rev) OVER (PARTITION BY brand ORDER BY yr)
             |      AS prev_rev
             |  FROM yearly)
             |SELECT brand, yr, ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
             |CASE WHEN prev_rev > 0 THEN ROUND(
             |  CAST(rev - prev_rev AS DOUBLE) / CAST(prev_rev AS DOUBLE), 6)
             |  END AS yoy_growth
             |FROM l""".stripMargin)),

    QueryDef("p22_outliers",
      (s, d) => outliers(Tables.events(s, d)),
      Some("""WITH rows_ AS (SELECT event_id, event_type, value,
             |    CAST(FLOOR(value * 100.0) AS BIGINT) AS xq FROM events),
             |mom AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(xq) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(xq AS DECIMAL(28,0)) * xq) AS DOUBLE) AS syy
             |  FROM rows_ GROUP BY 1 HAVING COUNT(*) >= 2),
             |ms AS (SELECT event_type, sy / n AS mean,
             |    sqrt(greatest((n * syy - sy * sy)
             |      / (CAST(n AS DOUBLE) * (n - 1)), 0.0)) AS sd
             |  FROM mom)
             |SELECT event_id, rows_.event_type, value,
             |ROUND((CAST(xq AS DOUBLE) - mean) / sd, 4) AS z
             |FROM rows_ JOIN ms ON rows_.event_type = ms.event_type
             |WHERE sd > 0.0
             |  AND abs((CAST(xq AS DOUBLE) - mean) / sd) > 3.0""".stripMargin)),

    // The blocking-health monitor for er_blocked_match (what
    // sim_bucket_stats is to the LSH index): blocks per size with the
    // candidate-pair budget each size class implies — the chart that
    // says whether MaxBlock purging is dormant insurance or actively
    // cutting recall.
    QueryDef("er_block_stats",
      (s, d) => {
        val p = Tables.documents(s, d).select(col("lang"),
          expr("n_chars div 50").as("lb"),
          split_part(col("text"), lit(" "), lit(1)).as("tok1"))
        p.groupBy(col("lang"), col("lb"), col("tok1"))
          .agg(count(lit(1)).as("bsz"))
          .groupBy(col("bsz"))
          .agg(count(lit(1)).as("n_blocks"))
          .select(col("bsz"), col("n_blocks"),
            // div, not /: integer division (both engines' / is float)
            expr("(bsz * (bsz - 1)) div 2 * n_blocks")
              .as("candidate_pairs"))
      },
      Some("""WITH p AS (SELECT lang, n_chars // 50 AS lb,
             |    split_part(text, ' ', 1) AS tok1 FROM documents),
             |b AS (SELECT lang, lb, tok1, CAST(COUNT(*) AS BIGINT) AS bsz
             |  FROM p GROUP BY 1, 2, 3)
             |SELECT bsz, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             |CAST((bsz * (bsz - 1)) // 2 * COUNT(*) AS BIGINT)
             |  AS candidate_pairs
             |FROM b GROUP BY 1""".stripMargin)),

    // ER4: pair completeness + reduction ratio of the blocking scheme
    // on the fixed-size sample — see blockQuality.
    QueryDef("er_block_quality",
      (s, d) => blockQuality(Tables.documents(s, d)),
      Some(s"""WITH p AS MATERIALIZED (SELECT doc_id, lang,
              |    n_chars // 50 AS lb,
              |    split_part(text, ' ', 1) AS tok1,
              |    regexp_replace(substr(text, 1, 60), '[^ -~]', '#', 'g')
              |      AS pre
              |  FROM documents
              |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              |  LIMIT $ErSample),
              |truth AS MATERIALIZED (SELECT a.doc_id i, b.doc_id j
              |  FROM p a JOIN p b ON a.doc_id < b.doc_id
              |  WHERE levenshtein(a.pre, b.pre) <= 5),
              |sized AS (SELECT * FROM p WHERE (lang, lb, tok1) IN (
              |  SELECT (lang, lb, tok1) FROM p
              |  GROUP BY lang, lb, tok1 HAVING COUNT(*) <= $MaxBlock)),
              |cand AS MATERIALIZED (SELECT a.doc_id i, b.doc_id j
              |  FROM sized a JOIN sized b
              |  ON a.lang = b.lang AND a.lb = b.lb AND a.tok1 = b.tok1
              |    AND a.doc_id < b.doc_id),
              |nd AS (SELECT CAST(COUNT(*) AS BIGINT) n_docs FROM p),
              |nt AS (SELECT CAST(COUNT(*) AS BIGINT) n_true FROM truth),
              |nc AS (SELECT CAST(COUNT(*) AS BIGINT) n_candidates FROM cand),
              |ng AS (SELECT CAST(COUNT(*) AS BIGINT) n_caught FROM truth t
              |  WHERE EXISTS (SELECT 1 FROM cand c
              |    WHERE c.i = t.i AND c.j = t.j))
              |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS total_pairs,
              |n_candidates, n_true, n_caught,
              |CASE WHEN n_true > 0
              |  THEN n_caught * 1000000 // n_true END AS pc_ppm,
              |CASE WHEN n_docs * (n_docs - 1) // 2 > 0
              |  THEN (n_docs * (n_docs - 1) // 2 - n_candidates) * 1000000
              |    // (n_docs * (n_docs - 1) // 2) END AS rr_ppm
              |FROM nd, nt, nc, ng""".stripMargin)),

    QueryDef("er_blocked_match",
      (s, d) => blockedMatch(Tables.documents(s, d)),
      Some(s"""WITH p0 AS (SELECT doc_id, lang, n_chars // 50 AS lb,
              |    split_part(text, ' ', 1) AS tok1,
              |    regexp_replace(substr(text, 1, 60), '[^ -~]', '#', 'g')
              |      AS pre FROM documents),
              |p AS (SELECT * FROM p0 WHERE (lang, lb, tok1) IN (
              |  SELECT (lang, lb, tok1) FROM p0
              |  GROUP BY lang, lb, tok1 HAVING COUNT(*) <= $MaxBlock))
              |SELECT a.doc_id AS i, b.doc_id AS j,
              |CAST(levenshtein(a.pre, b.pre) AS INT) AS dist
              |FROM p a JOIN p b
              |  ON a.lang = b.lang AND a.lb = b.lb AND a.tok1 = b.tok1
              |  AND a.doc_id < b.doc_id
              |WHERE levenshtein(a.pre, b.pre) <= 5""".stripMargin)),

    // ER3 (beyond-ref): golden-record consolidation — see
    // goldenRecords. Oracle = the er_blocked_match pair SQL + Dedup's
    // unrolled pointer-jump ladder + the survivor window.
    QueryDef("er_golden",
      (s, d) => goldenRecords(Tables.documents(s, d)),
      Some(s"""WITH p0 AS (SELECT doc_id, lang, n_chars // 50 AS lb,
              |    split_part(text, ' ', 1) AS tok1,
              |    regexp_replace(substr(text, 1, 60), '[^ -~]', '#', 'g')
              |      AS pre FROM documents),
              |p AS (SELECT * FROM p0 WHERE (lang, lb, tok1) IN (
              |  SELECT (lang, lb, tok1) FROM p0
              |  GROUP BY lang, lb, tok1 HAVING COUNT(*) <= $MaxBlock)),
              |m AS (SELECT a.doc_id AS i, b.doc_id AS j
              |  FROM p a JOIN p b
              |  ON a.lang = b.lang AND a.lb = b.lb AND a.tok1 = b.tok1
              |  AND a.doc_id < b.doc_id
              |  WHERE levenshtein(a.pre, b.pre) <= 5),
              |e AS MATERIALIZED (SELECT i, j FROM m UNION ALL SELECT j, i FROM m),
              |l0 AS MATERIALIZED (SELECT doc_id, doc_id AS lbl FROM documents),
              |${Dedup.ccFixSql},
              |g AS (SELECT d.doc_id, d.lang, d.n_chars, l.lbl AS cluster_id
              |  FROM documents d JOIN lcc l USING (doc_id)),
              |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
              |    ORDER BY n_chars DESC, doc_id) rk FROM g)
              |SELECT cluster_id,
              |MAX(CASE WHEN rk = 1 THEN doc_id END) AS golden_id,
              |CAST(COUNT(*) AS BIGINT) AS n_members,
              |MAX(CASE WHEN rk = 1 THEN n_chars END) AS golden_chars,
              |CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
              |FROM r GROUP BY 1""".stripMargin))
  )
}
