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

  test("decode: real PNG/JPEG payloads get true dimensions via imageio") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val real = Seq(
      (100L, "image", imageBytes(640, 480, "png")),
      (101L, "image", imageBytes(31, 17, "jpg")),
      // image-kind but non-image bytes: must fall back to the stub
      (102L, "image", "not an image".getBytes("UTF-8")),
      // real PNG bytes under a non-image kind: stub (kind wins)
      (103L, "audio", imageBytes(8, 8, "png")))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decode(real).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[String]("format")))).toMap
    assert(out(100L) === ((640, 480, "png")))
    assert(out(101L)._1 === 31 && out(101L)._2 === 17)
    assert(out(101L)._3 === "jpeg")
    assert(out(102L)._3 === "jpeg" && out(102L)._1 >= 320) // stub path
    assert(out(103L)._3 === "wav") // stub path, audio format
    // n_bytes is the raw payload size on both paths
    val nb = Multimodal.decode(real).filter(col("media_id") === 100L)
      .head().getAs[Long]("n_bytes")
    assert(nb === imageBytes(640, 480, "png").length.toLong)
  }

  test("ahash: codec-independent perceptual key, pattern-sensitive") {
    def pattern(f: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val leftBright = (x: Int, _: Int) => if (x < 32) 0xffffff else 0x000000
    val topBright = (_: Int, y: Int) => if (y < 32) 0xffffff else 0x000000
    val pngL = Multimodal.ahashImage(pattern(leftBright, "png")).get
    val jpgL = Multimodal.ahashImage(pattern(leftBright, "jpg")).get
    val pngT = Multimodal.ahashImage(pattern(topBright, "png")).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same picture, different codec: perceptually identical (JPEG's
    // loss may flip a boundary bit or two)
    assert(hamming(pngL, jpgL) <= 4, s"codec moved the hash: $pngL vs $jpgL")
    // different picture: far apart (half the bits disagree)
    assert(hamming(pngL, pngT) >= 16)
    // non-image bytes: None from the real path, stub = md5 60-bit prefix
    val txt = "not an image".getBytes("UTF-8")
    assert(Multimodal.ahashImage(txt).isEmpty)
    val md = java.security.MessageDigest.getInstance("MD5").digest(txt)
    val expect = java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.substring(0, 15), 16)
    assert(Multimodal.ahashStub(txt) === expect)
    // the full pass routes image-kind real images through pixels and
    // everything else through the stub
    val mixed = Seq(
      (1L, "image", pattern(leftBright, "png")),
      (2L, "image", txt),
      (3L, "audio", txt)).toDF("media_id", "kind", "payload")
    val got = Multimodal.ahash(mixed).as[(Long, String, Long)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) === pngL)
    assert(got(2L) === expect && got(3L) === expect)
  }

  test("phash: DCT key survives codec AND brightness shift; " +
    "patterns stay apart") {
    def pattern(f: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // textured pattern: a broad, well-separated DCT spectrum (a hard
    // step edge leaves most coefficients ~0, where the median compare
    // is pure noise — pathological for ANY pHash, not just this one)
    def gray(v: Int) = { val c = v & 0xff; (c << 16) | (c << 8) | c }
    def tex(scale: Int)(x: Int, y: Int) =
      gray(((x * 7 + (y * y) / 3 + ((x * y) % 31) * 5) % 200 + 28)
        * scale / 100)
    val texB = tex(100) _
    val texDim = tex(60) _ // same picture at 60% brightness
    val topBright = (_: Int, y: Int) => if (y < 32) 0xffffff else 0x000000
    val pngL = Multimodal.phashImage(pattern(texB, "png")).get
    val jpgL = Multimodal.phashImage(pattern(texB, "jpg")).get
    val pngDim = Multimodal.phashImage(pattern(texDim, "png")).get
    val pngT = Multimodal.phashImage(pattern(topBright, "png")).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(pngL, jpgL) <= 10, "codec moved the DCT hash")
    assert(hamming(pngL, pngDim) <= 10, "brightness moved the DCT hash")
    assert(hamming(pngL, pngT) >= 16, "different pictures too close")
    // non-image: None real path; pass stubs like ahash
    val txt = "not an image".getBytes("UTF-8")
    assert(Multimodal.phashImage(txt).isEmpty)
    val got = Multimodal.phash(Seq(
      (1L, "image", pattern(texB, "png")),
      (2L, "audio", txt)).toDF("media_id", "kind", "payload"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) === pngL)
    assert(got(2L) === Multimodal.ahashStub(txt))
  }

  test("phash pairs: re-encoded picture pairs up, different stays apart") {
    def pattern(f: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def gray(v: Int) = { val c = v & 0xff; (c << 16) | (c << 8) | c }
    def tex(scale: Int)(x: Int, y: Int) =
      gray(((x * 7 + (y * y) / 3 + ((x * y) % 31) * 5) % 200 + 28)
        * scale / 100)
    val topBright = (_: Int, y: Int) => if (y < 32) 0xffffff else 0x000000
    val media = Seq(
      (1L, "image", pattern(tex(100), "png")),
      (2L, "image", pattern(tex(100), "jpg")), // same picture, re-encoded
      (3L, "image", pattern(topBright, "png"))) // different picture
      .toDF("media_id", "kind", "payload")
    // hamming tolerance mirrors the phash codec bound asserted above
    val pairs = Multimodal.phashDupPairs(media, hammingT = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 <= 10L)
    // the summary row agrees: 3 assets, the one verified near-dup
    val sum = Multimodal.phashPairs(media)
      .as[(Long, Long, Long)].head()
    assert(sum._1 === 3L)
    assert(sum._2 >= 1L) // banding surfaced at least the true pair
  }

  test("phash clusters: transitive stub dups collapse to one canonical; " +
    "re-encoded picture clusters with its twin") {
    // three identical audio payloads (stub hash path): pairwise edges
    // (1,2)(1,3)(2,3) must collapse to ONE cluster with canonical 1;
    // the distinct fourth stays its own singleton
    val b = "same payload bytes".getBytes("UTF-8")
    val stub = Seq(
      (1L, "audio", b), (2L, "audio", b), (3L, "audio", b),
      (4L, "audio", "different bytes entirely".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.phashClusters(stub)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (4L, 4L, 1)))

    // real images: the re-encoded twin joins its cluster, the
    // different picture stays canonical alone (the pairs fixture)
    def pattern(f: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def gray(v: Int) = { val c = v & 0xff; (c << 16) | (c << 8) | c }
    def tex(x: Int, y: Int) =
      gray((x * 7 + (y * y) / 3 + ((x * y) % 31) * 5) % 200 + 28)
    val topBright = (_: Int, y: Int) => if (y < 32) 0xffffff else 0x000000
    val media = Seq(
      (1L, "image", pattern(tex, "png")),
      (2L, "image", pattern(tex, "jpg")),
      (3L, "image", pattern(topBright, "png")))
      .toDF("media_id", "kind", "payload")
    val img = Multimodal.phashClusters(media, hammingT = 10)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(img === Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 3L, 1)))
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
