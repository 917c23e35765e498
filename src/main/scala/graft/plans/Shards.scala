package graft.plans

import graft.operators.Quality
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the last hop of the curation pipeline —
  * materialize a curated corpus as N deterministically-shuffled
  * shards plus a MANIFEST the training job (and any re-export)
  * verifies against. The shard assignment is Quality.detShuffle's
  * engine-exact mod-prime hash, so the same corpus always lands in
  * the same shard layout regardless of cluster, partitioning, or
  * export order — the property that makes training runs reproducible
  * and incremental re-exports diffable.
  *
  * Scale design (100 TB): one shuffle (partitionBy the shard column
  * at write); the manifest is a per-shard aggregate of order-free
  * statistics — row count, byte count, and a wrapping sum of per-doc
  * content hashes (commutative, so partitioning cannot change it).
  * Shard count is the scale knob: raise it with corpus size to keep
  * one writer task's shard bounded.
  */
object Shards {

  /** Write `docs` as `nShards` hash-assigned shards under
    * `outDir/data/shard=K/` plus `outDir/manifest`. Returns the
    * manifest (shard, n_docs, n_bytes, content_sum).
    */
  def export(docs: DataFrame, outDir: String,
             nShards: Int = Quality.NShards): DataFrame = {
    val assigned = Quality.detShuffle(docs, nShards)
      .select(col("doc_id"), col("shard"))
      .join(docs, Seq("doc_id"))
    assigned.write.mode("overwrite")
      .partitionBy("shard").parquet(s"$outDir/data")
    val manifest = manifestOf(assigned)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/manifest")
    manifest
  }

  /** Order-free per-shard statistics of a (shard, doc_id, text, ...)
    * relation: the XOR-fold of xxhash64(doc_id, text) is commutative/
    * associative and overflow-free (ANSI-safe), so any partitioning
    * and any row order produce the identical checksum.
    */
  def manifestOf(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        bit_xor(xxhash64(col("doc_id"), col("text"))).as("content_sum"))

  /** Re-derive the manifest from the exported data and diff it
    * against the stored one: full-outer join on shard, any row where
    * the triples disagree (or one side is missing) is a finding.
    * Empty result = the export is intact.
    */
  def validate(spark: SparkSession, outDir: String): DataFrame = {
    val stored = spark.read.parquet(s"$outDir/manifest")
      .select(col("shard"), col("n_docs").as("m_docs"),
        col("n_chars").as("m_chars"), col("content_sum").as("m_sum"))
    val actual = manifestOf(spark.read.parquet(s"$outDir/data"))
    actual.join(stored, Seq("shard"), "full_outer")
      .filter(col("n_docs").isNull || col("m_docs").isNull ||
        col("n_docs") =!= col("m_docs") ||
        col("n_chars") =!= col("m_chars") ||
        col("content_sum") =!= col("m_sum"))
  }
}
