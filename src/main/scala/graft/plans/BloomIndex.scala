package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** S27: file-level bloom-filter skipping index — point-lookup data
  * skipping on a HIGH-CARDINALITY, UNSORTED column, the case min/max
  * footer stats (S18 range layout) and Z-order (S22) cannot serve: a
  * uniformly scattered key is inside every file's min/max range, so a
  * needle query scans the whole table. The index holds one bloom per
  * (file, column) — a few hundred KB per TB — and a lookup reads ONLY
  * the files whose bloom claims the key. Bloom semantics make pruning
  * sound: no false negatives (a skipped file provably lacks the key);
  * false positives only add files, never wrong rows, because the real
  * filter still runs on the rows read. This is Databricks' bloom
  * filter index / Parquet's column bloom shape, built as an explicit
  * sidecar table.
  *
  * Determinism: a bloom's bit array is the OR of per-key hash bits —
  * order-free like HLL registers — so the index bytes depend only on
  * each file's key SET, not on row order or partitioning.
  *
  * Scale: the build is one column-pruned scan grouped by file name
  * (each group streams through a fixed-size filter — no key
  * materialization); lookups read the index (files-grain rows), then
  * the surviving files. Expected-keys-per-file is the sizing knob and
  * rides with the store.
  */
object BloomIndex {

  final case class FileBloom(file: String, n_rows: Long,
                             bloom: Array[Byte])

  val DefaultFpp = 0.01
  /** Sizing assumption per file; a file holding more keys than this
    * degrades fpp gracefully (never correctness).
    */
  val ExpectedPerFile = 1 << 20

  def build(spark: SparkSession, dir: String, keyCol: String,
            fpp: Double = DefaultFpp,
            expected: Long = ExpectedPerFile): Unit = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select(col(keyCol).cast("long").as("k"),
        input_file_name().as("file"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .mapGroups { (file, it) =>
        val bf = BloomFilter.create(expected, fpp)
        var n = 0L
        it.foreach { case (k, _) => bf.putLong(k); n += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        FileBloom(file, n, bos.toByteArray)
      }
      .write.mode(SaveMode.Overwrite).parquet(s"$dir.bloomidx")
  }

  /** Files the index cannot rule out for `key` (sound superset of the
    * files that hold it).
    */
  def candidateFiles(spark: SparkSession, dir: String,
                     key: Long): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$dir.bloomidx")
      .as[FileBloom]
      .filter { fb =>
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(fb.bloom))
          .mightContainLong(key)
      }
      .map(_.file).collect().toSeq.sorted
  }

  /** Point lookup through the index: read only candidate files, then
    * apply the real filter — exact results, pruned IO.
    */
  def lookup(spark: SparkSession, dir: String, keyCol: String,
             key: Long): DataFrame = {
    val files = candidateFiles(spark, dir, key)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(col(keyCol) === key)
  }
}
