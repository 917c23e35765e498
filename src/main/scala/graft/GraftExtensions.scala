package graft

import graft.functions.{CosineSimExpr, DotProductExpr, IntDotExpr, L2NormExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * codegen expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done by
  * Verify/Bench/Smoke and the test session); on a cluster the same
  * config line in spark-defaults makes them available to plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProductExpr].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native per-key top-k planner rule
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    // exact-match materialized-view substitution at analysis time —
    // before the optimizer can push predicates through the aggregate
    // (no-op while the registry is empty)
    ext.injectPostHocResolutionRule(spark =>
      graft.plans.MvRewriteRule(spark))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential-fold dot product"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - L2 norm"),
      (args: Seq[Expression]) => L2NormExpr(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_doti"),
      info("graft_doti", "graft_doti(a, b) - exact integer dot product"),
      (args: Seq[Expression]) => IntDotExpr(args(0), args(1))))
    // Spark's own runtime-filter expression pair, surfaced as SQL
    // functions (OSS registers neither): a codegen'd aggregate that
    // builds a serialized bloom filter, and a codegen'd probe over
    // the broadcast bytes — replaces the two Scala-UDF probe sites
    // (round-11 VERDICT #5), keeping the prefilter scans inside
    // whole-stage codegen.
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(col, nItems, nBits) - serialized bloom filter"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, col) - bloom membership probe"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))
  }
}
