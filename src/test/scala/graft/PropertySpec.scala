package graft

import graft.functions.Functions
import graft.operators.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Property-based layer over the pure kernels the whole engine leans
  * on — the example-based specs prove behavior at chosen points;
  * these prove the ALGEBRAIC laws on generated inputs (fixed seed,
  * so the suite stays deterministic):
  *
  *  - minhash signatures: the union law (sig(A ∪ B) = slot-wise
  *    min) is what makes banding correct and signatures mergeable
  *    across shards/ingest batches; order/multiplicity invariance is
  *    what makes them partitioning-safe.
  *  - shingles: the Column HOF chain must equal an independent Scala
  *    sliding-window derivation, and shinglesFast must equal
  *    shingles (the 2× scan-path claim rests on byte-equality).
  *  - zValue: the Morton interleave must match an independent Scala
  *    bit-weave — the Layout file-skipping guarantee is only as good
  *    as the curve.
  *  - dsum: the money-sum must be invariant to row order and
  *    partitioning (the decimal device exists precisely because
  *    double sums are not).
  *
  * Each property evaluates the REAL Column expression through the
  * live session (one-row local relation), not a reimplementation.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20)
    .withInitialSeed(Seed(42L))
    .withWorkers(1)

  private def check(label: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$label: ${r.status}")
  }

  private def evalRow(cols: Column*) =
    spark.range(1).select(cols: _*).head()

  private def longArr(xs: Seq[Long]): Column =
    if (xs.isEmpty) array().cast("array<bigint>")
    else array(xs.map(lit(_)): _*)

  private def strArr(xs: Seq[String]): Column =
    if (xs.isEmpty) array().cast("array<string>")
    else array(xs.map(lit(_)): _*)

  private val hashSetGen: Gen[List[Long]] = for {
    n <- Gen.choose(1, 40)
    l <- Gen.listOfN(n, Gen.chooseNum(0L, Functions.P32 - 1))
  } yield l

  private val tokGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 12)
    l <- Gen.listOfN(n, Gen.oneOf("aa", "b", "ccc", "dd", "e", "ff"))
  } yield l

  test("minhash: union of shingle sets = slot-wise min of signatures") {
    check("union law", Prop.forAll(hashSetGen, hashSetGen) { (a, b) =>
      val row = evalRow(
        Functions.minhashSig(longArr(a ++ b)).as("u"),
        zip_with(Functions.minhashSig(longArr(a)),
          Functions.minhashSig(longArr(b)),
          (x, y) => least(x, y)).as("m"))
      row.getSeq[Long](0) == row.getSeq[Long](1)
    })
  }

  test("minhash: signature invariant to order and multiplicity") {
    check("order/multiplicity", Prop.forAll(hashSetGen) { a =>
      val row = evalRow(
        Functions.minhashSig(longArr(a)).as("s"),
        Functions.minhashSig(longArr(a.reverse ++ a)).as("t"))
      row.getSeq[Long](0) == row.getSeq[Long](1)
    })
  }

  test("shingles: equals an independent sliding-window derivation") {
    check("sliding", Prop.forAll(tokGen, Gen.choose(1, 4)) { (toks, n) =>
      val expected =
        if (toks.size < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      val got = evalRow(Functions.shingles(strArr(toks), n).as("s"))
        .getSeq[String](0)
      got == expected
    })
  }

  test("shinglesFast: equals shingles on whitespace-collapsed text") {
    // non-empty BY CONSTRUCTION (not suchThat): shrinking ignores
    // suchThat predicates, and the empty list fails this property for
    // unrelated reasons (tokens("") = [""]), which would mask the
    // real counterexample
    val nonEmpty = for {
      n <- Gen.choose(1, 12)
      l <- Gen.listOfN(n, Gen.oneOf("aa", "b", "ccc", "dd", "e", "ff"))
    } yield l
    check("fast=slow", Prop.forAll(nonEmpty, Gen.choose(1, 3)) { (toks, n) =>
      val txt = toks.mkString(" ")
      val row = evalRow(
        Functions.shingles(Functions.tokens(lit(txt)), n).as("a"),
        Functions.shinglesFast(lit(txt), n).as("b"))
      row.getSeq[String](0) == row.getSeq[String](1)
    })
  }

  test("zValue: matches an independent Scala Morton interleave") {
    def mortonRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val dim = Gen.chooseNum(0L, 65535L)
    check("morton", Prop.forAll(dim, dim) { (x, y) =>
      evalRow(plans.Layout.zValue(lit(x), lit(y)).as("z")).getLong(0) ==
        mortonRef(x, y, 16)
    })
  }

  test("dsum: invariant to row order and partitioning") {
    val moneyGen = for {
      n <- Gen.choose(1, 30)
      l <- Gen.listOfN(n, Gen.chooseNum(-99999L, 99999L))
    } yield l.map(_ / 100.0)
    val p = Prop.forAll(moneyGen) { vs =>
      def total(xs: Seq[Double], parts: Int): Double =
        xs.toDF("v").repartition(parts)
          .agg(Functions.dsum(col("v")).as("s")).head().getDouble(0)
      val base = total(vs, 1)
      total(vs.reverse, 7) == base && total(vs.sorted, 3) == base
    }
    check("dsum", SCTest.Parameters.default.withMinSuccessfulTests(10)
      .withInitialSeed(Seed(42L)).withWorkers(1), p)
  }

  private def check(label: String, params: SCTest.Parameters, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$label: ${r.status}")
  }

  test("labelComponents: equals a union-find reference on random graphs") {
    // pointer-jumping CC backs every *_clusters / er_golden /
    // mm_phash_clusters query — prove the labels against an
    // independent union-find on generated graphs. THIS TEST FOUND A
    // REAL BUG: the former fixed 7-round ladder left a non-min label
    // on a 29-vertex graph (the jump only doubles coverage when the
    // local min-id chain points toward the component min), which
    // drove the fixpoint rewrite — change note 49
    val gGen = for {
      n <- Gen.choose(2, 36)
      m <- Gen.choose(0, n)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1, n - 1)
        b <- Gen.choose(a + 1, n)
      } yield (a.toLong, b.toLong))
    } yield (n, es.distinct)
    val p = Prop.forAll(gGen) { case (n, edges) =>
      val universe = (1 to n).map(_.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("i", "j")
        else edges.toDF("i", "j")
      val got = Dedup.labelComponents(pairs, universe)
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
      // union-by-min reference: the root of a set is always its min
      // id, so find(v) IS the expected canonical label
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (1 to n).forall(v => got(v.toLong) == find(v).toLong)
    }
    check("cc", SCTest.Parameters.default.withMinSuccessfulTests(8)
      .withInitialSeed(Seed(42L)).withWorkers(1), p)
  }

  test("hex60: matches an independent md5-prefix derivation, in range") {
    // the cross-engine hash bridge every dedup/LSH join keys on —
    // derive it independently (JDK MessageDigest on UTF-8 bytes,
    // 15-hex-char prefix) and pin range: [0, 2^60)
    val strGen = Gen.frequency(
      9 -> (for {
        n <- Gen.choose(0, 24)
        cs <- Gen.listOfN(n, Gen.alphaNumChar)
      } yield cs.mkString),
      1 -> Gen.const("héllo wörld ✓"))
    check("hex60", Prop.forAll(strGen) { s =>
      val got = evalRow(Functions.hex60(lit(s)).as("h")).getLong(0)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val ref = java.lang.Long.parseLong(md.take(15), 16)
      got == ref && got >= 0L && got < (1L << 60)
    })
  }

  test("bucket10: lands in [0, 10) for non-negative keys and salts") {
    check("bucket10", Prop.forAll(
      Gen.chooseNum(0L, 1000000000000L), Gen.chooseNum(0L, 1000L)) {
      (k, s) =>
        val b = evalRow(graft.functions.Functions
          .bucket10(lit(k), lit(s)).as("b")).getLong(0)
        b >= 0L && b < 10L
    })
  }
}
