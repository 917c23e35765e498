package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-index contract: lookups through the index equal the full
  * scan exactly, a present key's file is never skipped (no false
  * negatives), pruning actually skips files for scattered keys, and
  * the index bytes are partitioning-invariant (order-free bit OR).
  */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  test("lookup equals full scan; real pruning; order-free index bytes") {
    val dir = java.nio.file.Files.createTempDirectory("bidx").toString + "/t"
    // 8 files of 1000 keys each; keys are scattered (hash-like), so
    // every file's min/max covers every key — min/max skipping is
    // useless here BY CONSTRUCTION, the bloom index is not
    val rows = (0 until 8000).map(i => ((i * 2654435761L) % 100000L, i))
    rows.toDF("k", "payload").repartition(8)
      .write.parquet(dir)
    BloomIndex.build(spark, dir, "k")

    val idx = spark.read.parquet(s"$dir.bloomidx")
    assert(idx.count() === 8L)
    assert(idx.agg(sum("n_rows")).as[Long].head() === 8000L)

    // every present key: index lookup == full-scan filter, exactly
    val probes = rows.map(_._1).distinct.take(20)
    probes.foreach { key =>
      val viaIdx = BloomIndex.lookup(spark, dir, "k", key)
        .as[(Long, Int)].collect().sorted.toSeq
      val full = spark.read.parquet(dir).filter(col("k") === key)
        .as[(Long, Int)].collect().sorted.toSeq
      assert(viaIdx === full, s"key $key diverged")
      assert(full.nonEmpty)
    }

    // pruning is real: a key living in one file reads few files
    // (fpp 1% over 8 files -> expected ~1 file, allow slack)
    val one = rows.map(_._1).distinct.head
    assert(BloomIndex.candidateFiles(spark, dir, one).size <= 3)

    // an absent key is (almost always) fully pruned and always empty
    val absent = 100007L // outside the mod-100000 key domain
    assert(BloomIndex.lookup(spark, dir, "k", absent).count() === 0L)

    // order-free build: rebuilding over the same data files (with
    // whatever row/group order the second scan produces) yields
    // byte-identical blooms — the bit array is an OR over the key SET
    def idxBytes() = spark.read.parquet(s"$dir.bloomidx")
      .select("file", "bloom")
      .as[(String, Array[Byte])].collect()
      .map { case (f, b) => f -> b.toSeq }.toMap
    val first = idxBytes()
    BloomIndex.build(spark, dir, "k")
    assert(idxBytes() === first)
  }
}
