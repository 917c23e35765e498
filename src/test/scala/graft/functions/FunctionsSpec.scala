package graft.functions

import graft.SparkSpec
import graft.functions.Functions._
import org.apache.spark.sql.functions._

/** Cross-engine determinism primitives: these invariants are what the
  * DuckDB oracle compare rests on.
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("hex60 equals JVM md5-prefix parse (the DuckDB-compatible hash)") {
    val words = Seq("hello", "spark", "a b c", "")
    val got = words.toDF("w").select(hex60(col("w"))).as[Long].collect()
    val want = words.map { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    assert(got.toSeq === want)
  }

  test("bucket10 is stable, in range, and partition-independent") {
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(200)((math.abs(rnd.nextLong()) % 1000000000L,
      math.abs(rnd.nextLong()) % 10000L))
    val once = keys.toDF("k", "s")
      .select(col("k"), col("s"), bucket10(col("k"), col("s")).as("b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(once.forall { case (_, _, b) => b >= 0 && b < 10 })
    val again = keys.toDF("k", "s").repartition(7)
      .select(col("k"), col("s"), bucket10(col("k"), col("s")).as("b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(once === again)
  }

  test("shingles: distinct word n-grams, 1-based slices") {
    val got = Seq("a b c d e", "a b", "x x x x")
      .toDF("t").select(shingles(tokens(col("t")), 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d", "c d e"))
    assert(got(1) === Seq.empty) // shorter than n
    assert(got(2) === Seq("x x x")) // distinct collapses repeats
  }

  test("shinglesFast: regex form equals the HOF form on messy input") {
    val fixtures = Seq("a b c d e", "a b", "x x x x", "", "   ",
      "ONE  two\tthree\n four five", "solo", "p q r", "t.o-k3n$ we!rd ch@rs mixed")
    val df = fixtures.toDF("t")
    val slow = df.select(shingles(tokens(lower(col("t"))), 3))
      .as[Seq[String]].collect()
    val fast = df.select(shinglesFast(normText(col("t")), 3))
      .as[Seq[String]].collect()
    assert(fast.toSeq === slow.toSeq)
    val slow2 = df.select(shingles(tokens(lower(col("t"))), 2))
      .as[Seq[String]].collect()
    val fast2 = df.select(shinglesFast(normText(col("t")), 2))
      .as[Seq[String]].collect()
    assert(fast2.toSeq === slow2.toSeq)
  }

  test("dot/cosine: sequential double fold on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).as[Double].head() === 32.0)
    val c = df.select(cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("dsum: money sums are exact (decimal) regardless of order") {
    val vals = Seq(0.1, 0.2, 0.3, 1e9, -1e9, 0.4)
    val got = vals.toDF("x").repartition(4)
      .agg(dsum(col("x"))).as[Double].head()
    assert(got === 1.0) // plain double sum would drift here
  }

  test("vector expressions coexist in one codegen scope (fresh-named accumulators)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // with non-nullable children nullSafeCodeGen emits each body
    // UNWRAPPED into the shared scope; fixed accumulator identifiers
    // would collide and fail Janino compilation here (direct generate
    // has no interpreted fallback — exactly the regression this guards)
    val at = ArrayType(DoubleType, containsNull = false)
    val a = BoundReference(0, at, nullable = false)
    val b = BoundReference(1, at, nullable = false)
    val proj = GenerateMutableProjection.generate(Seq(
      CosineSimExpr(a, b), CosineSimExpr(b, a),
      DotProductExpr(a, b), DotProductExpr(b, a),
      L2NormExpr(a), L2NormExpr(b)))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0, 3.0)),
      ArrayData.toArrayData(Array(4.0, 5.0, 6.0))))
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(out.getDouble(0) - want) < 1e-15)
    assert(math.abs(out.getDouble(1) - want) < 1e-15)
    assert(out.getDouble(2) === 32.0)
    assert(out.getDouble(3) === 32.0)
    assert(out.getDouble(4) === math.sqrt(14.0))
    assert(out.getDouble(5) === math.sqrt(77.0))
  }

  test("graft_doti: exact integer dot, fresh-named in shared codegen scope") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val at = ArrayType(LongType, containsNull = false)
    val a = BoundReference(0, at, nullable = false)
    val b = BoundReference(1, at, nullable = false)
    val proj = GenerateMutableProjection.generate(Seq(
      IntDotExpr(a, b), IntDotExpr(b, a)))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(255L, 0L, 7L)),
      ArrayData.toArrayData(Array(255L, 255L, 3L))))
    assert(out.getLong(0) === 255L * 255L + 21L)
    assert(out.getLong(1) === 255L * 255L + 21L)
    // SQL surface through the extension registration
    import spark.implicits._
    val sql = Seq((Seq(1L, 2L), Seq(10L, -4L))).toDF("x", "y")
      .selectExpr("graft_doti(x, y) AS d").as[Long].head()
    assert(sql === 2L)
  }

  test("minhash permutation stays within int64 and P32") {
    val h = P32 - 1 // worst case input
    val got = Seq(h).toDF("h")
      .select(minhashPerm(col("h"), lit(31L))).as[Long].head()
    assert(got >= 0 && got < P32)
  }
}
