package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media row: an opaque binary payload plus routing metadata —
  * the shape a 100 TB image/audio/video corpus lands in (builder
  * brief, "multimodal columns").
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded-media metadata produced by the (stubbed) decoder. */
case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                        width: Int, height: Int, format: String)

/** Multimodal-column operators: decode / feature-extract / resize /
  * frame-sample over opaque `binary` payloads.
  *
  * IMAGE decode is real: payloads carrying a PNG/JPEG magic go
  * through `javax.imageio` (JDK built-in — no new dependency), which
  * reads true width/height/format off the header without a full
  * pixel decode. Audio/video (no JDK codec) and non-image bytes fall
  * back to a clearly-marked deterministic STUB (dimensions derived
  * from the payload's md5 — see decodeBytesStub). Everything around
  * the codec is real and tested: the binary column schema, the
  * Dataset[MediaRow] → mapPartitions → Dataset[DecodedMedia] batch
  * plumbing (the Scala analog of mapInPandas: one iterator per
  * partition, decoder state initialized once per partition, rows
  * streamed through), and the downstream frame-sample / resize /
  * feature plumbing as pure Column expressions.
  *
  * Scale notes: decode is embarrassingly parallel per partition —
  * the mapPartitions shape exists precisely so a real decoder pays
  * its init cost once per task, not once per row; payloads stay off
  * the driver; feature/resize/frame ops are expression-level, so
  * Catalyst prunes the (huge) payload column the moment it is no
  * longer referenced.
  */
object Multimodal {

  /** The synthetic media table: text payloads as opaque bytes, kind
    * round-robined so every branch has rows.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder ??? for audio/video (no JDK codec exists) and for
    * image bytes that are not a parseable image. Deterministic fake:
    * dimensions are carved out of the payload's md5 so any engine
    * (and the DuckDB oracle) reproduces them. The SIGNATURE is the
    * contract: bytes in, (n_bytes, width, height, format) out.
    */
  def decodeBytesStub(payload: Array[Byte], kind: String): (Long, Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hex = md.map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    val fmt = kind match {
      case "image" => "jpeg"; case "audio" => "wav"; case _ => "mp4"
    }
    (payload.length.toLong, (h1 % 1601L + 320L).toInt,
      (h2 % 901L + 180L).toInt, fmt)
  }

  // Strong magic-byte gates for the real-codec path. Both contain
  // bytes (0x89 / 0xFF 0xD8) that cannot occur at the start of the
  // synthetic text payloads, so the oracle's stub model stays exact
  // on testdata. GIF ("GIF89a") and BMP ("BM") magics are printable
  // ASCII — text-collidable — so those formats stay on the stub
  // until payloads carry a content-type column.
  private def looksLikePng(p: Array[Byte]): Boolean =
    p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte
  private def looksLikeJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && p(0) == 0xFF.toByte && p(1) == 0xD8.toByte &&
      p(2) == 0xFF.toByte

  /** REAL image decode via `javax.imageio`: reads true
    * width/height/format from the header (no full pixel decode — the
    * metadata pass over a 100 TB corpus must not rasterize). None on
    * unparseable bytes → caller falls back to the stub.
    */
  def decodeImage(payload: Array[Byte]): Option[(Long, Int, Int, String)] = {
    if (!looksLikePng(payload) && !looksLikeJpeg(payload)) return None
    val iin = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iin)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iin)
          Some((payload.length.toLong, r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase))
        } catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally if (iin != null) iin.close()
  }

  /** Per-payload dispatch: real codec for real images, stub otherwise. */
  def decodeBytes(payload: Array[Byte], kind: String): (Long, Int, Int, String) =
    if (kind == "image") decodeImage(payload)
      .getOrElse(decodeBytesStub(payload, kind))
    else decodeBytesStub(payload, kind)

  /** 64-bit average-hash (aHash) of a REAL image: full rasterize
    * (perceptual hashing needs pixels, unlike the header-only
    * metadata pass), bilinear downscale to 8×8, integer-weighted
    * grayscale (299/587/114 per mille), bit k set iff pixel k exceeds
    * the integer mean. Two encodings of the same picture hash to
    * (nearly) the same 64 bits — the codec-independent near-dup key
    * exact byte fingerprints (mm_dedup) can never provide. None when
    * the payload is not a decodable image.
    */
  def ahashImage(payload: Array[Byte]): Option[Long] = {
    if (!looksLikePng(payload) && !looksLikeJpeg(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
      } finally g.dispose()
      val px = (0 until 64).map { k =>
        val rgb = small.getRGB(k % 8, k / 8)
        ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      }
      val mean = px.sum / 64
      Some(px.zipWithIndex.foldLeft(0L) { case (h, (v, k)) =>
        if (v > mean) h | (1L << k) else h
      })
    } catch { case _: Exception => None }
  }

  /** MM8: DCT perceptual hash (the classic pHash) — the frequency-
    * domain sibling of aHash: decode, bilinear 32×32 grayscale, 2-D
    * DCT-II, keep the top-left 8×8 LOW-frequency block (minus the DC
    * term), bit k set iff coefficient k exceeds the block median.
    * Robust to the brightness/contrast shifts that flip aHash bits
    * (they scale coefficients but largely preserve the
    * above/below-median pattern); the standard near-dup key for
    * re-encoded and mildly edited images. Same mapPartitions batch
    * shape; None for undecodable payloads.
    */
  def phashImage(payload: Array[Byte]): Option[Long] = {
    if (!looksLikePng(payload) && !looksLikeJpeg(payload)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val n = 32
      val small = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, n, n, null)
      } finally g.dispose()
      val px = Array.tabulate(n, n) { (y, x) =>
        val rgb = small.getRGB(x, y)
        (((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000).toDouble
      }
      // separable DCT-II: rows then columns, only the first 8 output
      // frequencies of each pass are ever read
      val cosTab = Array.tabulate(8, n) { (u, i) =>
        math.cos((2 * i + 1) * u * math.Pi / (2.0 * n))
      }
      val rows = Array.tabulate(n, 8) { (y, u) =>
        var s = 0.0; var i = 0
        while (i < n) { s += px(y)(i) * cosTab(u)(i); i += 1 }
        s
      }
      val freq = Array.tabulate(8, 8) { (v, u) =>
        var s = 0.0; var i = 0
        while (i < n) { s += rows(i)(u) * cosTab(v)(i); i += 1 }
        s
      }
      val coeffs = (0 until 64).filter(_ != 0)
        .map(k => freq(k / 8)(k % 8))
      val median = coeffs.sorted.apply(coeffs.size / 2)
      Some((0 until 64).filterNot(_ == 0).foldLeft(0L) { (h, k) =>
        if (freq(k / 8)(k % 8) > median) h | (1L << k) else h
      })
    } catch { case _: Exception => None }
  }

  /** pHash pass: real DCT hash for decodable images, md5 stub
    * otherwise — mm_ahash's registration shape.
    */
  def phash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val h = if (r.kind == "image") phashImage(r.payload)
          .getOrElse(ahashStub(r.payload))
        else ahashStub(r.payload)
        (r.media_id, r.kind, h)
      }
    }.toDF("media_id", "kind", "phash")
  }

  val PhashBands = 4
  val PhashBandBits = 15
  val PhashHammingT = 6

  /** MM9: image near-dup pairing over the pHash — the multimodal
    * sibling of dedup_simhash_pairs: the 60-bit hash splits into 4
    * disjoint 15-bit bands, assets sharing ANY band become candidate
    * pairs (a near-dup differing in ≤ PhashHammingT of 60 bits keeps
    * at least one band intact unless its flips hit 4 distinct bands —
    * at T=6 a miss needs flips spread 2+2+1+1, the standard banded
    * recall tradeoff), and candidates verify on exact Hamming
    * distance via bit_count(xor). Registered output is the summary
    * row (assets, candidates, verified near-dups) — on the synthetic
    * text-payload corpus the md5-stub hashes make candidate counts
    * exact on both engines while real-image pairing is spec-proven
    * on PNG/JPEG re-encodings of one picture.
    *
    * Scale: the shuffle carries (band, 15-bit value) keys — band
    * occupancy is the LSH-style knob; candidate volume is
    * Σ_bucket n², monitored exactly like sim_bucket_stats; the
    * verify is a per-pair integer popcount.
    */
  /** Banded candidate pairs with both hashes (hi, hj), one row per
    * unordered pair; `h` must be (media_id, phash).
    */
  private def phashCandidates(h: DataFrame): DataFrame = {
    val bands = h.select(col("media_id"), col("phash"),
      explode(array((0 until PhashBands).map(k =>
        struct(lit(k).as("b"),
          expr(s"shiftright(phash, ${k * PhashBandBits}) & 32767")
            .as("v"))): _*)).as("band"))
      .select(col("media_id"), col("phash"),
        col("band.b").as("b"), col("band.v").as("v"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("i"), col("y.media_id").as("j"))
      .agg(max(col("x.phash")).as("hi"), max(col("y.phash")).as("hj"))
  }

  def phashPairs(media: DataFrame): DataFrame = {
    val h = phash(media).select(col("media_id"), col("phash"))
      .localCheckpoint(false) // both join sides + the asset count
    val agg = phashCandidates(h)
      .withColumn("ham", expr("bit_count(hi ^ hj)"))
      .agg(count(lit(1)).as("n_candidate_pairs"),
        coalesce(sum(when(col("ham") <= PhashHammingT, 1L)
          .otherwise(0L)), lit(0L)).as("n_near_dups"))
    h.agg(count(lit(1)).as("n_assets")).crossJoin(agg)
  }

  /** Verified near-dup PAIRS from the same banded candidates — the
    * row-level form the spec drives on real re-encoded images.
    */
  def phashDupPairs(media: DataFrame,
                    hammingT: Int = PhashHammingT): DataFrame = {
    val h = phash(media).select(col("media_id"), col("phash"))
      .localCheckpoint(false)
    phashCandidates(h)
      .withColumn("hamming", expr("bit_count(hi ^ hj)").cast("long"))
      .filter(col("hamming") <= hammingT)
      .select(col("i"), col("j"), col("hamming"))
  }

  /** MM10 (round 9): near-dup CLUSTERS over the verified pHash pair
    * graph — the pairs→clusters rung the text dedup ladder has
    * (dedup_clusters) applied to the media tier: pointer-jumping CC
    * labels every asset with its cluster's min media_id, the
    * canonical keeper a multimodal curation pass retains (pairs
    * alone can't drive a keep/drop decision — transitive groups
    * can). Reuses Dedup.labelComponents verbatim (the audited
    * edge-subgraph CC: only edge-incident assets iterate, the corpus
    * joins back once); edges are the banded-candidate +
    * exact-Hamming-verified pairs of mm_phash_pairs, so candidate
    * volume stays band-bucketed at any corpus size.
    */
  def phashClusters(media: DataFrame,
                    hammingT: Int = PhashHammingT): DataFrame = {
    val m = media.localCheckpoint(false) // edges + the asset universe
    Dedup.labelComponents(
      phashDupPairs(m, hammingT).select(col("i"), col("j")),
      m.select(col("media_id").as("doc_id")))
      .select(col("doc_id").as("media_id"), col("canonical_id"),
        col("is_canonical"))
  }

  /** Stub hash for non-image payloads: the 60-bit md5 prefix, exactly
    * the oracle's CAST(concat('0x', substr(md5(payload),1,15)) AS
    * BIGINT) — so the registered query stays hash-checkable on the
    * synthetic (text-payload) corpus.
    */
  def ahashStub(payload: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  /** Perceptual-hash pass: real aHash for decodable images, md5 stub
    * otherwise — same mapPartitions batch shape as decode.
    */
  def ahash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val h = if (r.kind == "image") ahashImage(r.payload)
          .getOrElse(ahashStub(r.payload))
        else ahashStub(r.payload)
        (r.media_id, r.kind, h)
      }
    }.toDF("media_id", "kind", "ahash")
  }

  /** Decode pass: Dataset[MediaRow] → mapPartitions → typed metadata.
    * One decoder "session" per partition (where a heavier codec would
    * allocate its state once per task), rows streamed lazily.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // heavier codec init would go here, once per partition/task
      rows.map { r =>
        val (n, w, h, f) = decodeBytes(r.payload, r.kind)
        DecodedMedia(r.media_id, r.kind, n, w, h, f)
      }
    }.toDF()
  }

  /** Resize plumbing: fit into a 224-wide box, integer aspect math
    * (exact on any engine).
    */
  def resizePlan(decoded: DataFrame, targetW: Int = 224): DataFrame =
    decoded.filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"),
        lit(targetW).as("out_width"),
        expr(s"cast((height * $targetW) div width as int)")
          .as("out_height"))

  /** Frame sampling for video: every 24th frame index of a fake
    * n_frames derived from the decoded width (deterministic), long
    * form via explode — the shape a frame-level feature job consumes.
    */
  def frameSample(decoded: DataFrame, stride: Int = 24): DataFrame =
    decoded.filter(col("kind") === "video")
      .withColumn("n_frames", (col("width").cast("long") % 240L) + 1L)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong)))
          .as("frame_idx"))

  /** Feature extraction stub: 8-dim double vector carved from the
    * payload md5, normalized to [0,1] — the real version is the same
    * plumbing with a model forward pass in the lambda.
    */
  def features(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      expr("""transform(sequence(0, 7), i ->
        cast(conv(substring(md5(payload), i*4+1, 4), 16, 10) as double)
        / 65535.0D)""").as("feature"))

  // ---- driver-contract registry ----

  private def media(s: SparkSession, d: String) =
    mediaTable(Tables.documents(s, d))

  private val mediaSql =
    """media AS (SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |  text AS payload FROM documents)""".stripMargin

  private val decodedSql =
    s"""$mediaSql,
       |decoded AS (SELECT media_id, kind,
       |  CAST(strlen(payload) AS BIGINT) AS n_bytes,
       |  CAST(CAST(concat('0x', substr(md5(payload),1,15)) AS BIGINT) % 1601 + 320 AS INT) AS width,
       |  CAST(CAST(concat('0x', substr(md5(payload),16,15)) AS BIGINT) % 901 + 180 AS INT) AS height,
       |  CASE kind WHEN 'image' THEN 'jpeg' WHEN 'audio' THEN 'wav'
       |    ELSE 'mp4' END AS format
       |  FROM media)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("mm_decode",
      (s, d) => decode(media(s, d)),
      Some(s"""WITH $decodedSql
              |SELECT media_id, kind, n_bytes, width, height, format
              |FROM decoded""".stripMargin)),

    QueryDef("mm_resize",
      (s, d) => resizePlan(decode(media(s, d))),
      Some(s"""WITH $decodedSql
              |SELECT media_id, width, height, 224 AS out_width,
              |CAST((height * 224) // width AS INT) AS out_height
              |FROM decoded WHERE kind = 'image'""".stripMargin)),

    QueryDef("mm_frame_sample",
      (s, d) => frameSample(decode(media(s, d))),
      Some(s"""WITH $decodedSql
              |SELECT media_id, n_frames, unnest(generate_series(0, n_frames - 1, 24)) AS frame_idx
              |FROM (SELECT media_id, width % 240 + 1 AS n_frames
              |  FROM decoded WHERE kind = 'video')""".stripMargin)),

    // Long form (media_id, idx, value) rather than an array column:
    // the driver's pandas comparator cannot sort array cells, so the
    // vector is exploded and rounded identically on both engines.
    QueryDef("mm_features",
      (s, d) => features(media(s, d))
        .select(col("media_id"),
          posexplode(col("feature")).as(Seq("idx", "value")))
        .withColumn("value", round(col("value"), 6)),
      Some("""WITH media AS (SELECT doc_id AS media_id, text AS payload
             |  FROM documents)
             |SELECT media_id, CAST(g.i AS INT) AS idx,
             |  ROUND(CAST(CAST(concat('0x', substr(md5(payload), g.i*4+1, 4)) AS BIGINT) AS DOUBLE) / 65535.0, 6) AS value
             |FROM media, (SELECT unnest(generate_series(0, 7)) AS i) g""".stripMargin)),

    // Exact binary dedup over the opaque payload column — the asset-
    // level dedup a multimodal corpus runs before any decode (bytes
    // are hashed once at scan; the only shuffle key is the 16-byte
    // digest, never the payload). Keep-lowest-id canonical mirrors
    // dedup_exact's rule.
    QueryDef("mm_dedup",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp"))
        media(s, d)
          .select(col("media_id"), col("kind"),
            md5(col("payload")).as("fp"))
          .withColumn("is_canonical",
            (col("media_id") === min(col("media_id")).over(w)).cast("int"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |    WHEN doc_id % 3 = 1 THEN 'audio'
             |    ELSE 'video' END AS kind,
             |  md5(text) AS fp FROM documents)
             |SELECT media_id, kind, fp,
             |CAST(media_id = MIN(media_id) OVER (PARTITION BY fp) AS INT)
             |  AS is_canonical
             |FROM m""".stripMargin)),

    // MM7 (beyond-ref): perceptual average-hash per asset — the
    // codec-independent near-dup key (two encodings of one picture
    // share it; exact fingerprints don't). Real pixels for decodable
    // images (spec-proven); the synthetic text payloads all take the
    // md5-stub path the oracle models.
    QueryDef("mm_ahash",
      (s, d) => ahash(media(s, d)),
      Some(s"""WITH $mediaSql
              |SELECT media_id, kind,
              |CAST(concat('0x', substr(md5(payload),1,15)) AS BIGINT)
              |  AS ahash
              |FROM media""".stripMargin)),

    // MM8 (beyond-ref): DCT pHash — real frequency-domain hash for
    // decodable images (spec-checked), md5 stub on the synthetic
    // text payloads the oracle models.
    QueryDef("mm_phash",
      (s, d) => phash(media(s, d)),
      Some(s"""WITH $mediaSql
              |SELECT media_id, kind,
              |CAST(concat('0x', substr(md5(payload),1,15)) AS BIGINT)
              |  AS phash
              |FROM media""".stripMargin)),

    // MM9 (beyond-ref): banded pHash near-dup pairing — see
    // phashPairs; real-image recall is MultimodalSpec's job, the
    // oracle checks the banding/verify machinery on the stub hashes.
    QueryDef("mm_phash_pairs",
      (s, d) => phashPairs(media(s, d)),
      Some(s"""WITH $mediaSql,
              |h AS (SELECT media_id,
              |  CAST(concat('0x', substr(md5(payload),1,15)) AS BIGINT)
              |    AS phash FROM media),
              |b AS (SELECT media_id, phash, k.k AS bnd,
              |    (phash >> (${PhashBandBits} * k.k)) & 32767 AS v
              |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS k) k),
              |cand AS (SELECT x.media_id i, y.media_id j,
              |    MAX(x.phash) hi, MAX(y.phash) hj
              |  FROM b x JOIN b y ON x.bnd = y.bnd AND x.v = y.v
              |    AND x.media_id < y.media_id
              |  GROUP BY 1, 2),
              |na AS (SELECT CAST(COUNT(*) AS BIGINT) n_assets FROM h),
              |agg AS (SELECT CAST(COUNT(*) AS BIGINT) n_candidate_pairs,
              |    CAST(COALESCE(SUM(CASE WHEN
              |      bit_count(xor(hi, hj)) <= $PhashHammingT
              |      THEN 1 ELSE 0 END), 0) AS BIGINT) n_near_dups
              |  FROM cand)
              |SELECT n_assets, n_candidate_pairs, n_near_dups
              |FROM na, agg""".stripMargin)),

    // MM10 (round 9): pairs → clusters — canonical keeper per
    // near-dup group via the audited pointer-jump CC; see
    // phashClusters. Oracle: the mm_phash_pairs edge derivation +
    // Dedup's shared CC ladder (stub hashes make the synthetic
    // corpus exact on both engines; real-image pairing is
    // spec-proven on re-encodings).
    QueryDef("mm_phash_clusters",
      (s, d) => phashClusters(media(s, d)),
      Some(s"""WITH $mediaSql,
              |h AS (SELECT media_id,
              |  CAST(concat('0x', substr(md5(payload),1,15)) AS BIGINT)
              |    AS phash FROM media),
              |b AS (SELECT media_id, phash, k.k AS bnd,
              |    (phash >> (${PhashBandBits} * k.k)) & 32767 AS v
              |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS k) k),
              |cand AS (SELECT x.media_id i, y.media_id j,
              |    MAX(x.phash) hi, MAX(y.phash) hj
              |  FROM b x JOIN b y ON x.bnd = y.bnd AND x.v = y.v
              |    AND x.media_id < y.media_id
              |  GROUP BY 1, 2),
              |p AS (SELECT i, j FROM cand
              |  WHERE bit_count(xor(hi, hj)) <= $PhashHammingT),
              |e AS MATERIALIZED (SELECT i, j FROM p
              |  UNION ALL SELECT j, i FROM p),
              |l0 AS MATERIALIZED (SELECT media_id AS doc_id,
              |  media_id AS lbl FROM h),
              |${Dedup.ccFixSql}
              |SELECT doc_id AS media_id, lbl AS canonical_id,
              |CAST(doc_id = lbl AS INT) AS is_canonical
              |FROM lcc""".stripMargin)),

    // Modality-mix corpus report: asset counts and payload bytes per
    // (kind, source) — the first dashboard a multimodal training-data
    // pipeline stands up (is the mix on plan? which source ships the
    // bytes?). One scan, one small aggregate; byte math is exact
    // integers end to end.
    QueryDef("mm_corpus_stats",
      (s, d) => {
        val docs = Tables.documents(s, d)
        mediaTable(docs)
          .join(docs.select(col("doc_id").as("media_id"), col("source")),
            Seq("media_id"))
          .groupBy(col("kind"), col("source"))
          .agg(count(lit(1)).as("n_assets"),
            sum(length(col("payload"))).as("total_bytes"))
          .withColumn("avg_bytes",
            expr("total_bytes div n_assets"))
      },
      Some(s"""WITH $mediaSql,
              |j AS (SELECT kind, source,
              |    CAST(strlen(payload) AS BIGINT) AS nb
              |  FROM media JOIN documents ON media_id = doc_id)
              |SELECT kind, source, CAST(COUNT(*) AS BIGINT) AS n_assets,
              |CAST(SUM(nb) AS BIGINT) AS total_bytes,
              |CAST(SUM(nb) // COUNT(*) AS BIGINT) AS avg_bytes
              |FROM j GROUP BY 1, 2""".stripMargin))
  )
}
