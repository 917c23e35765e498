package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class StreamDoc(doc_id: Long, text: String, lang: String,
                     source: String)

class CorpusIngestSpec extends SparkSpec {

  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and " +
    "then it ran away to find some other interesting things in a forest"

  test("streaming gate splits keepers and quarantine across batches") {
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val (clean, quar, ckpt) = (s"$root/clean", s"$root/quar", s"$root/ckpt")
    val in = MemoryStream[StreamDoc]
    val q = CorpusIngest.run(in.toDF(), clean, quar, ckpt)

    in.addData(
      StreamDoc(1, good, "en", "web"),
      StreamDoc(2, "spam spam spam spam spam spam the of and to", "en", "web"))
    q.processAllAvailable()
    in.addData(StreamDoc(3, good + " second wave of text here", "en", "crawl"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(clean)
      .select("doc_id", "source").as[(Long, String)].collect().sortBy(_._1)
    assert(kept.toSeq === Seq((1L, "web"), (3L, "crawl")))
    // quality column rides along for downstream budget selection
    assert(spark.read.parquet(clean).columns.contains("quality"))

    val dropped = spark.read.parquet(quar)
      .select("doc_id", "r_keep").as[(Long, Int)].collect()
    assert(dropped.map(_._1).toSeq === Seq(2L))
    assert(dropped.head._2 === 0) // audit flag names the failing gate
  }
}
