package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CommerceSpec extends SparkSpec {

  import spark.implicits._

  test("rfm: quartile thresholds are value-based — ties share a score") {
    // 8 customers, one order each on the same date => recency all 0
    // (every r_score = 4 after inversion: nobody exceeds any cutpoint),
    // monetary 10,10,10,10,20,20,30,40 => q1=10 q2=10 q3=20 (ceil-rank
    // discrete): the four 10s all score m=1, the 20s m=3, 30/40 m=4.
    val orders = (1 to 8).map { i =>
      val price = Seq(10, 10, 10, 10, 20, 20, 30, 40)(i - 1)
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        price.toDouble)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val seg = Commerce.rfmSegments(orders)
      .select("r_score", "f_score", "m_score", "n_customers")
      .as[(Int, Int, Int, Long)].collect().toSet
    assert(seg === Set((4, 1, 1, 4L), (4, 1, 3, 2L), (4, 1, 4, 2L)))
  }

  test("rfm: recency score inverts — most recent buyer gets r=4") {
    val orders = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-02-01", 10.0),
      (3L, "2024-03-01", 10.0), (4L, "2024-04-01", 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
    val byR = Commerce.rfmSegments(orders)
      .select("r_score", "n_customers").as[(Int, Long)].collect().toMap
    // distinct recencies 0,31,60,91: quartiles split one each, r=4 is
    // the recency-0 customer
    assert(byR(4) === 1L && byR(1) === 1L)
  }

  test("basket lift: co-purchase counts and lift from distinct items") {
    // orders: {A,B} x2, {A,C}, {B,C,A} -> pairs AB:3 AC:2 BC:1; N=4
    val lines = Seq(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 103L), (4L, 102L), (4L, 103L), (4L, 101L),
      (4L, 101L)) // dup line: distinct() must collapse it
      .toDF("l_orderkey", "l_partkey")
    val got = Commerce.basketLift(lines, k = 10)
      .select("i", "j", "n_ab", "lift").as[(Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((101L, 102L))._1 === 3L)
    assert(got((101L, 103L))._1 === 2L)
    assert(got((102L, 103L))._1 === 1L)
    // lift(AB) = n_ab*N/(n_a*n_b) = 3*4/(4*3) = 1.0
    assert(got((101L, 102L))._2 === 1.0)
  }

  test("trend slope: exact LSQ over weekly revenue") {
    // brand X: weekly revenue 10, 20, 30 over weeks w, w+1, w+2
    // (7-day steps from epoch) -> slope exactly 10/week
    val part = Seq((1L, "X")).toDF("p_partkey", "p_brand")
    val lines = Seq(
      (1L, "1995-01-02", 10.0), (1L, "1995-01-09", 20.0),
      (1L, "1995-01-16", 30.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("l_shipdate")))
    val got = Commerce.trendSlope(lines, part)
      .select("brand", "n_weeks", "slope_per_week")
      .as[(String, Long, Double)].collect()
    assert(got.toSeq === Seq(("X", 3L, 10.0)))
  }

  test("trend slope: a single-week brand has no slope and is excluded") {
    val part = Seq((1L, "X"), (2L, "Y")).toDF("p_partkey", "p_brand")
    val lines = Seq(
      (1L, "1995-01-02", 10.0), (1L, "1995-01-09", 20.0),
      (2L, "1995-01-02", 99.0)) // brand Y: one week only
      .toDF("l_partkey", "l_shipdate", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("l_shipdate")))
    val got = Commerce.trendSlope(lines, part)
      .select("brand").as[String].collect()
    assert(got.toSeq === Seq("X")) // no NaN/NULL row for Y
  }

  test("outliers: a zero-variance class crashes neither engine path") {
    val rows = (1 to 50).map(i => (i.toLong, "flat", 10.0)) ++
      (51 to 250).map(i => (i.toLong, "wide", (i % 40).toDouble)) ++
      Seq((999L, "wide", 5000.0))
    val got = Commerce.outliers(
      rows.toDF("event_id", "event_type", "value"))
      .select("event_id").as[Long].collect()
    assert(got.toSeq === Seq(999L)) // flat class contributes nothing
  }

  test("decay: 30-day half-life halves the contribution exactly") {
    // part 1: sales today and 30 days ago -> 1.0 + 0.5
    // part 2: one sale 60 days ago -> 0.25
    val lines = Seq(
      (1L, "2024-03-01"), (1L, "2024-01-31"), (2L, "2024-01-01"))
      .toDF("l_partkey", "l_shipdate")
      .withColumn("l_shipdate", to_timestamp(col("l_shipdate")))
    val got = Commerce.decayTopk(lines, k = 10)
      .select("part_id", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) === 1.5)
    assert(got(2L) === 0.25)
  }

  test("outliers: flags the planted spike, not the uniform bulk") {
    val base = (1 to 200).map(i =>
      (i.toLong, "view", 10.0 + (i % 10) * 0.1))
    val spike = Seq((999L, "view", 500.0))
    val got = Commerce.outliers(
      (base ++ spike).toDF("event_id", "event_type", "value"))
      .select("event_id").as[Long].collect()
    assert(got.toSeq === Seq(999L))
  }

  test("cohort LTV: first-month cohorts, cumulative revenue per offset") {
    // customer 1 first buys in Jan (10), again in Mar (20);
    // customer 2 first buys in Mar (40) -> cohorts Jan{1}, Mar{2}
    val orders = Seq(
      (1L, "2024-01-10", 10.0), (1L, "2024-03-05", 20.0),
      (2L, "2024-03-20", 40.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
    val got = Commerce.cohortLtv(orders)
      .select("cohort", "month_offset", "cohort_size", "revenue",
        "ltv_per_customer")
      .as[(Int, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val jan = 2024 * 12 + 1
    val mar = 2024 * 12 + 3
    assert(got((jan, 0)) === ((1L, 10.0, 10.0)))
    assert(got((jan, 2)) === ((1L, 20.0, 30.0))) // cumulative
    assert(got((mar, 0)) === ((1L, 40.0, 40.0)))
  }

  test("blocked match: candidates only within a block, verified by distance") {
    val docs = Seq(
      // same block (en, bucket 0, "alpha"), distance 1 -> match
      (1L, "en", 40L, "alpha beta gamma delta"),
      (2L, "en", 41L, "alpha beta gamma delte"),
      // same text but different lang -> different block, no candidate
      (3L, "fr", 40L, "alpha beta gamma delta"),
      // same block but distance > 5 -> verified away
      (4L, "en", 44L, "alpha omega psi chi rho tau"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val got = Commerce.blockedMatch(docs)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect()
    assert(got.toSeq === Seq((1L, 2L, 1)))
  }

  test("blocked match: oversize blocks are purged, small ones survive") {
    // 5 identical docs in one block (> maxBlock=3) -> all purged;
    // a 2-doc block elsewhere still matches
    val docs = (
      (1 to 5).map(i => (i.toLong, "en", 40L, "common text here")) ++
        Seq((10L, "fr", 40L, "petit texte un"),
          (11L, "fr", 41L, "petit texte um")))
      .toDF("doc_id", "lang", "n_chars", "text")
    val got = Commerce.blockedMatch(docs, maxDist = 5, maxBlock = 3)
      .select("i", "j").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((10L, 11L)))
  }

  test("block quality: a straddling true pair lowers PC, RR prices " +
    "the avoided budget") {
    // truth (unblocked, lev ≤ 5): (1,2), (1,3), (2,3). Blocks by
    // (lang, lb, tok1): {1,2} share "hello", 3 sits alone under
    // "hallo" — the classic dirty-first-token blocking failure — and
    // 4 is unrelated. Candidates = {(1,2)} only.
    val docs = Seq(
      (1L, "en", 40L, "hello world alpha beta"),
      (2L, "en", 40L, "hello world alpha betz"),
      (3L, "en", 40L, "hallo world alpha beta"),
      (4L, "en", 300L, "completely different content entirely"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val r = Commerce.blockQuality(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    val (nDocs, total, nCand, nTrue, nCaught, pc, rr) = r.head
    assert(nDocs === 4L && total === 6L)
    assert(nTrue === 3L && nCand === 1L && nCaught === 1L)
    assert(pc === 1000000L / 3L)       // 1 of 3 true pairs survives
    assert(rr === 5L * 1000000L / 6L)  // 5 of 6 budget pairs avoided
  }

  test("golden records: matched pair merges; survivor is the longest text") {
    val docs = Seq(
      (1L, "en", 10L, "alpha beta gamma"),
      (2L, "en", 300L, "unrelated long text"),
      (10L, "fr", 40L, "petit texte un"),
      (11L, "fr", 41L, "petit texte um"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val got = Commerce.goldenRecords(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 10 and 11 block together and match within edit distance; the
    // cluster labels with the min id, the longer text survives
    assert(got.keySet === Set(1L, 2L, 10L))
    assert(got(10L) === ((10L, 11L, 2L, 41L, 1L)))
    // singletons are their own golden record
    assert(got(1L) === ((1L, 1L, 1L, 10L, 1L)))
  }

  test("psi drift: stable distribution scores zero in every band") {
    // midpoint of [jan1, jan3] is jan2: jan1 = reference, jan3 = current;
    // both sides have the same 3-low/1-high value mix
    val orders = (Seq.fill(3)(10000.0) ++ Seq(60000.0)).flatMap(v =>
      Seq(("2024-01-01", v), ("2024-01-03", v)))
      .toDF("o_orderdate", "o_totalprice")
    val got = Commerce.driftPsi(orders)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(0L, 1L))
    got.values.foreach { case (_, nRef, nCur, sRef, sCur, psi) =>
      assert(nRef === nCur)
      assert(sRef === sCur)
      assert(psi === 0L)
    }
  }

  test("psi drift: a full distribution shift fires the 0.25 alarm") {
    // reference all in band 0, current all in band 1 (plus one extreme
    // current value proving the top-band cap)
    val orders = (Seq.fill(4)(("2024-01-01", 10000.0)) ++
      Seq.fill(4)(("2024-01-03", 60000.0)) :+ ("2024-01-03", 9.0e8))
      .toDF("o_orderdate", "o_totalprice")
    val got = Commerce.driftPsi(orders)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // the extreme value clamps into the last band, not beyond it
    assert(got.keySet === Set(0L, 1L, 9L))
    assert(got(9L)._2 === 0L && got(9L)._3 === 1L)
    // both shifted bands contribute positive PSI; the total crosses
    // the standard 0.25 retrain threshold
    assert(got(0L)._6 > 0L && got(1L)._6 > 0L)
    assert(got.values.map(_._6).sum > 250000L)
  }

  test("dow seasonality: epoch-day dow, exact ppm index vs daily mean") {
    // 1970-01-01 was a Thursday -> dow 0; Jan 2 -> dow 1
    val orders = Seq(
      ("1970-01-01 00:00:00", 10.0), ("1970-01-01 12:00:00", 20.0),
      ("1970-01-02 00:00:00", 30.0))
      .toDF("d", "o_totalprice")
      .select(col("d").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
    val got = Commerce.dowSeasonality(orders)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    // dow 0: 2 orders over 1 day vs overall 3 over 2 days ->
    // (2*2*1e6) div (1*3) = 1333333 ppm; dow 1: (1*2*1e6) div 3
    assert(got(0L) === ((0L, 1L, 2L, 30.0, 1333333L)))
    assert(got(1L) === ((1L, 1L, 1L, 30.0, 666666L)))
  }
}
