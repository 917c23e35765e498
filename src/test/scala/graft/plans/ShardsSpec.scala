package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard export contract: the written layout round-trips the corpus,
  * the manifest matches an independent recount, validation is empty
  * on an intact export and non-empty after tampering, and the same
  * corpus always produces the identical manifest (reproducibility —
  * the property a training job keys on).
  */
class ShardsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("export round-trips, validates clean, and detects tampering") {
    val docs = graft.Tables.documents(spark, d)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = Shards.export(docs, out)

    // round-trip: all docs present exactly once, spread over shards
    val back = spark.read.parquet(s"$out/data")
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    assert(back.select("shard").distinct().count() ===
      graft.operators.Quality.NShards.toLong)
    // text content survives the round trip
    assert(back.select("doc_id", "text")
      .except(docs.select("doc_id", "text")).isEmpty)

    // manifest == independent recount, validation clean
    assert(manifest.count() === graft.operators.Quality.NShards.toLong)
    assert(Shards.validate(spark, out).isEmpty)

    // reproducibility: a second export of the same corpus (different
    // input partitioning) yields the identical manifest
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val manifest2 = Shards.export(docs.repartition(7), out2)
    assert(manifest.except(manifest2).isEmpty &&
      manifest2.except(manifest).isEmpty, "manifest not reproducible")

    // tampering: drop one shard's files -> validate flags that shard
    val shard0 = new java.io.File(s"$out/data/shard=0")
    shard0.listFiles().foreach(_.delete())
    shard0.delete()
    val findings = Shards.validate(spark, out).collect()
    assert(findings.length === 1 && findings.head.getAs[Long]("shard") === 0L,
      findings.mkString(","))
  }
}
