package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary schema, mapPartitions decode batch
  * shape, and the metadata/feature transforms.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  val docs = Seq(
    (0L, "an image payload"), (1L, "an audio payload"),
    (2L, "a video payload"), (3L, "another image")).toDF("doc_id", "text")

  test("media table: binary payload column, kinds round-robined") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType.typeName === "binary")
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds === Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
  }

  test("decode: mapPartitions stub is deterministic and typed") {
    val d1 = Multimodal.decode(Multimodal.mediaTable(docs)).collect()
    val d2 = Multimodal.decode(Multimodal.mediaTable(docs.repartition(3))).collect()
    assert(d1.map(_.toString).sorted.toSeq === d2.map(_.toString).sorted.toSeq)
    val row = Multimodal.decode(Multimodal.mediaTable(docs))
      .filter(col("media_id") === 0L).head()
    assert(row.getAs[Long]("n_bytes") === "an image payload".length.toLong)
    assert(row.getAs[Int]("width") >= 320 && row.getAs[Int]("width") < 1921)
    assert(row.getAs[String]("format") === "jpeg")
  }

  test("resize: integer aspect math") {
    val out = Multimodal.resizePlan(Multimodal.decode(Multimodal.mediaTable(docs)))
      .select("media_id", "width", "height", "out_width", "out_height")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("out_width") === 224)
      assert(r.getAs[Int]("out_height") ===
        (r.getAs[Int]("height") * 224) / r.getAs[Int]("width"))
    }
  }

  test("frame sample: strided indices bounded by n_frames") {
    val fs = Multimodal.frameSample(Multimodal.decode(Multimodal.mediaTable(docs)))
      .select("media_id", "n_frames", "frame_idx")
      .as[(Long, Long, Long)].collect()
    assert(fs.nonEmpty)
    fs.foreach { case (_, n, idx) =>
      assert(idx >= 0 && idx < n && idx % 24 === 0)
    }
  }

  test("features: 8-dim normalized vector from payload hash") {
    val f = Multimodal.features(Multimodal.mediaTable(docs))
      .select("feature").as[Seq[Double]].collect()
    assert(f.forall(v => v.length === 8 && v.forall(x => x >= 0.0 && x <= 1.0)))
    assert(f.distinct.length === f.length) // payload-dependent
  }
}
