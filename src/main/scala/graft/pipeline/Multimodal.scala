package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct, and per-batch feature
 * extraction runs via `mapPartitions` (the JVM analogue of `mapInPandas`:
 * batched, columnar-friendly, one decoder instance per partition).
 *
 * The IMAGE kind is decoded for real: the JDK ships javax.imageio with a
 * pure-Java PNG codec, so an image payload that actually parses yields
 * its TRUE width/height (q35 pins this end-to-end against a DuckDB
 * oracle). Audio/video decode remains STUBBED — this container has no
 * such codecs — behind `MediaDecoder`, which produces a deterministic
 * fake (byte-statistics) feature vector; undecodable image bytes fall
 * back to the same stub. The Spark-side contract (schema, batching,
 * partition-level decoder lifecycle, null/short-payload handling) is
 * real and tested; swapping in further real codecs is a one-class change.
 */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, bytes: Long,
                                 meta: MediaMeta, features: Array[Double])

  /**
   * STUB decoder — deterministic fake in place of a real codec.
   * Real implementation would decode the payload (JPEG/PNG/WAV/...) and
   * emit true dimensions + a model embedding. The fake is built from
   * ORACLE-REPRODUCIBLE primitives so the whole pipeline is verifiable
   * end-to-end in DuckDB (q23):
   *  - sizes derive from the 60-bit md5 hash of the payload bytes (the
   *    Dedup.md5Hash60 construction: decimal value of the first 15 hex
   *    digits — DuckDB: ('0x'||substring(md5(x),1,15))::UBIGINT);
   *  - features = 16-bin high-nibble byte histogram, normalized in
   *    double precision (high nibble of byte i = hex digit 2i of the
   *    payload's hex dump — DuckDB-expressible via hex()+regexp).
   */
  final class MediaDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")

    /** 60-bit md5 hash (value of the first 15 hex digits) — non-negative.
      * Computed numerically: the first 15 hex digits are the top 60 bits
      * of the first 8 digest bytes, so big-endian-load then >>> 4 (no
      * per-byte string formatting in the per-payload hot path). */
    private def hash60(payload: Array[Byte]): Long = {
      md.reset()
      val d = md.digest(payload)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
      v >>> 4
    }

    /** True only for magic bytes that cannot occur as leading plain text
      * (PNG's 0x89 lead, JPEG's 0xFFD8FF): gates the real decoder so
      * text-byte stub payloads (q23) NEVER depend on how lenient some
      * installed ImageIO reader is about ASCII-leading formats ("BM...",
      * "GIF87a" are valid document prefixes). */
    private def hasBinaryImageMagic(p: Array[Byte]): Boolean =
      (p.length > 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p.length > 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 && (p(2) & 0xFF) == 0xFF)

    /** Real image decode (JDK javax.imageio — the PNG/JPEG readers are
      * pure Java, headless-safe): true dimensions when the payload
      * carries a binary image signature and parses; null otherwise. */
    private def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage =
      if (!hasBinaryImageMagic(payload)) null
      else try {
        // explicit in-memory ImageInputStream: ImageIO.read(InputStream)
        // defaults to a FileCacheImageInputStream (ImageIO.getUseCache —
        // one temp-file create+write+delete PER IMAGE); the payload is
        // already fully in memory, so the disk round-trip is pure
        // overhead. Same readers, same bytes, same decode result —
        // ImageIO.read(ImageInputStream) closes the stream itself.
        javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload)))
      } catch { case _: Exception => null }

    def decode(kind: String, payload: Array[Byte]): (MediaMeta, Array[Double]) = {
      if (payload == null || payload.isEmpty)
        return (MediaMeta(kind, 0, 0, 0L), Array.fill(16)(0.0))
      val h = hash60(payload)
      val realImage = if (kind == "image") decodeImage(payload) else null
      val meta = kind match {
        case "image" if realImage != null =>
          MediaMeta(kind, realImage.getWidth, realImage.getHeight, 0L)
        case "image" => MediaMeta(kind, 64 + (h % 1920).toInt, 64 + ((h >> 11) % 1080).toInt, 0L)
        case "audio" => MediaMeta(kind, 0, 0, 1000L + h % 600000L)
        case "video" => MediaMeta(kind, 320 + (h % 1600).toInt, 240 + ((h >> 7) % 840).toInt, 1000L + (h >> 13) % 3600000L)
        case _       => MediaMeta(kind, 0, 0, 0L)
      }
      val hist = new Array[Long](16)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xF0) >> 4) += 1L; i += 1 }
      val n = payload.length.toDouble
      (meta, hist.map(_.toDouble / n))
    }
  }

  /** Deterministic PNG synthesis: pixel content is a pure function of
    * (x, y, seed), so the same inputs give the same decoded image
    * everywhere. Hand-rolled spec-conformant encoder (signature + IHDR +
    * one IDAT + IEND, 8-bit RGB, filter 0, BEST_SPEED deflate) because
    * ImageIO's PNG WRITER runs max-compression and dominated q35's cost;
    * the DECODE side — the operator under test — stays the real
    * javax.imageio reader, which round-trips these bytes pixel-exactly
    * (pinned in PipelineOpsSpec). */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    // raw image data: per scanline, 1 filter byte (0 = None) + RGB triples
    val raw = new Array[Byte](height * (1 + width * 3))
    var idx = 0
    var y = 0
    while (y < height) {
      raw(idx) = 0; idx += 1
      var x = 0
      while (x < width) {
        val v = (((x * 31 + y) * 131) ^ seed).toInt & 0xFFFFFF
        raw(idx) = ((v >> 16) & 0xFF).toByte
        raw(idx + 1) = ((v >> 8) & 0xFF).toByte
        raw(idx + 2) = (v & 0xFF).toByte
        idx += 3
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    val idat = {
      val out = new java.io.ByteArrayOutputStream(raw.length / 3 + 64)
      val ds = new java.util.zip.DeflaterOutputStream(out, deflater, 1 << 14)
      ds.write(raw); ds.finish()
      out.toByteArray
    }
    deflater.end()

    val bos = new java.io.ByteArrayOutputStream(idat.length + 64)
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'), 0, 8)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      val tag = kind.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      bos.write(be(data.length), 0, 4)
      bos.write(tag, 0, 4)
      bos.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tag); crc.update(data)
      bos.write(be(crc.getValue.toInt), 0, 4)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    def be32(v: Int): Unit = { ihdr.write((v >> 24) & 0xFF); ihdr.write((v >> 16) & 0xFF)
      ihdr.write((v >> 8) & 0xFF); ihdr.write(v & 0xFF) }
    be32(width); be32(height)
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor RGB
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression, filter, interlace
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Frame-sample stub: deterministic frame offsets for a video payload. */
  def frameSampleOffsets(durationMs: Long, frames: Int): Seq[Long] =
    if (durationMs <= 0 || frames <= 0) Nil
    else (0 until frames).map(i => durationMs * i / frames)

  /**
   * Batched feature extraction: one decoder per partition (mirrors the
   * per-batch model initialization pattern of mapInPandas at scale).
   */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val decoder = new MediaDecoder
      it.map { m =>
        val (meta, feats) = decoder.decode(m.kind, m.payload)
        MediaFeatures(m.media_id, m.kind,
          if (m.payload == null) 0L else m.payload.length.toLong, meta, feats)
      }
    }
  }

  /** Synthesize a deterministic media table from any binary-ish source
    * column (sandbox stand-in for a crawl's media side-table). */
  def synthesize(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
