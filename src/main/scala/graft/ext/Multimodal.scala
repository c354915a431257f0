package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing ([EXT], SURVEY §2.10): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct. The
  * Spark-side machinery — schema, partition sizing, per-partition
  * batched processing, feature schema — is real and tested. IMAGE
  * decode is real (`javax.imageio` ships in the JDK: png/jpeg/gif/
  * bmp mime + true dimensions + pixel features); AUDIO decode is real
  * for RIFF/WAVE payloads ([[decodeWav]]: header metadata + PCM16
  * sample features — the container ships no compressed-audio codecs,
  * and none are needed for the canonical training-data format); VIDEO
  * metadata is real for ISO-BMFF/MP4 payloads ([[decodeMp4]]: box walk
  * to mvhd/tkhd for exact duration + track dimensions) while frame
  * features remain deterministic byte statistics (no video codec in
  * the JDK), keeping the pipeline end-to-end verifiable.
  *
  * Scale notes: rows carry megabyte blobs, so the knobs that matter are
  * `spark.sql.files.maxPartitionBytes` (keep partitions ≲ a few hundred
  * MB of blob data) and `maxRecordsPerFile` on write. Feature extraction
  * is mapPartitions — one iterator pass, no shuffle; a real decoder
  * would amortize model/codec init per partition exactly where
  * `decodeInit` runs.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Wrap any table into media rows (test harness: text bytes stand in
    * for encoded frames). Deterministic: meta derives from the payload.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        lit(s"application/x-fake-$kind").as("mime"),
        (length(col(payloadCol)) % 1920).cast("int").as("width"),
        (length(col(payloadCol)) % 1080).cast("int").as("height"),
        (length(col(payloadCol)) * 10L).cast("long").as("duration_ms")).as("meta"))

  /** Number of feature dimensions the decoders emit. */
  val FeatureDim = 8

  /** Fallback feature extractor: deterministic byte statistics of the
    * payload, so tests and oracles can verify the distributed plumbing
    * end-to-end. Real decoders cover images ([[decodeImage]], JDK
    * ImageIO), WAV audio ([[decodeWav]]), and MP4 video metadata
    * ([[decodeMp4]]); this covers compressed audio, non-ISO-BMFF
    * video, non-decodable image bytes — and supplies the frame
    * features for video, whose codecs the JDK doesn't ship.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    val buckets = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      buckets(i % FeatureDim) += (bytes(i) & 0xff)
      i += 1
    }
    buckets.map(b => (b % 1000) / 1000f)
  }

  /** REAL image decode via `javax.imageio` (ships in the JDK — no
    * external codec needed for png/jpeg/gif/bmp): mime + true pixel
    * dimensions + an 8-dim feature vector (per-channel means, luma
    * mean/spread, aspect, bright/dark fractions) over a bounded pixel
    * grid (≤ ~4096 samples, so a 100-MP scan costs the same as a
    * thumbnail). Returns None when the bytes aren't a decodable image —
    * callers fall back to [[decodeStub]].
    */
  /** Magic-byte signatures of the formats the JDK's ImageIO ships
    * readers for — checked BEFORE touching ImageIO, because the
    * reader-registry scan + stream wrapper cost ~0.1 ms per call and
    * at corpus scale most blobs are not images. (WBMP is the one JDK
    * reader deliberately NOT pre-matched: its "magic" is 0x00 0x00,
    * which matches arbitrary binary and would defeat the filter.)
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte) ||        // png
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||       // jpeg
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) || // gif
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||         // bmp
      (b(0) == 'I'.toByte && b(1) == 'I'.toByte && b(2) == 0x2A.toByte &&
        b(3) == 0x00.toByte) ||                             // tiff LE
      (b(0) == 'M'.toByte && b(1) == 'M'.toByte && b(2) == 0x00.toByte &&
        b(3) == 0x2A.toByte))                               // tiff BE

  /** REAL audio decode for RIFF/WAVE payloads (the canonical PCM
    * container; header layout is public knowledge — RIFF tag, `fmt `
    * chunk with format/channels/rate/bits, `data` chunk with the
    * payload size). Returns (mime, channels, sampleRate, durationMs,
    * features): duration is exact (`dataLen / byteRate`); the 8-dim
    * features come from a bounded sweep (≤ ~4096 samples) of PCM16
    * data — mean |amplitude|, RMS, zero-crossing rate, peak, loud/
    * quiet fractions, channel count, capped duration. Non-PCM16
    * encodings keep the real header metadata with byte-statistic
    * features. None for anything that is not a WAV — callers fall
    * back to [[decodeStub]].
    */
  def decodeWav(bytes: Array[Byte]): Option[(String, Int, Int, Long, Array[Float])] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // Chunk sizes are UNSIGNED 32-bit and the bytes are untrusted web
    // content: keep the advance in Long arithmetic so a crafted size
    // near 2^32 can neither wrap the offset negative nor stall the
    // walk at zero progress — either condition ends the scan with
    // whatever chunks were already found.
    var off = 12L
    var fmt = Option.empty[(Int, Int, Int, Int)] // format, channels, rate, bits
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = tag(o); val sz = u32(o + 4)
      if (id == "fmt " && off + 24 <= bytes.length)
        fmt = Some((u16(o + 8), u16(o + 10), u32(o + 12).toInt, u16(o + 22)))
      else if (id == "data") { dataOff = o + 8; dataLen = sz }
      off += 8L + sz + (sz & 1L) // chunks are word-aligned; always advances ≥ 8
    }
    fmt match {
      case Some((af, ch, rate, bits)) if ch > 0 && rate > 0 && bits > 0 && dataOff >= 0 =>
        val byteRate = rate.toLong * ch * math.max(bits / 8, 1)
        val durMs = if (byteRate > 0) dataLen * 1000L / byteRate else 0L
        val avail = math.min(dataLen, (bytes.length - dataOff).toLong).toInt
        val feats =
          if (af == 1 && bits == 16 && avail >= 2) {
            val nSamples = avail / 2
            val step = math.max(1, nSamples / 4096)
            var sAbs = 0.0; var s2 = 0.0; var peak = 0.0
            var zc = 0L; var loud = 0L; var quiet = 0L; var cnt = 0L
            var prevSign = 0
            var i = 0
            while (i < nSamples) {
              val o = dataOff + i * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort / 32768.0
              val a = math.abs(s)
              sAbs += a; s2 += s * s; if (a > peak) peak = a
              val sign = java.lang.Double.compare(s, 0.0)
              if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
              if (sign != 0) prevSign = sign
              if (a > 0.5) loud += 1
              if (a < 0.05) quiet += 1
              cnt += 1
              i += step
            }
            val n = math.max(cnt, 1L).toDouble
            Array((sAbs / n).toFloat, math.sqrt(s2 / n).toFloat,
              (zc / n).toFloat, peak.toFloat,
              (loud / n).toFloat, (quiet / n).toFloat,
              math.min(ch / 8f, 1f), math.min(durMs / 60000f, 1f))
          } else decodeStub(java.util.Arrays.copyOfRange(
            bytes, dataOff, dataOff + math.max(avail, 0)))
        Some(("audio/wav", ch, rate, durMs, feats))
      case _ => None
    }
  }

  /** REAL video metadata decode for ISO-BMFF (MP4/MOV) payloads. The
    * box layout is public knowledge (ISO/IEC 14496-12): each box is
    * `[u32 big-endian size][4-char type]`, `size==1` means a u64
    * largesize follows, `size==0` means to-end-of-file; `moov` and
    * `trak` are pure containers whose payload is again boxes. We walk
    * to `moov/mvhd` for timescale+duration (v0: u32s at payload+12;
    * v1: u64 duration at payload+20) and to each `moov/trak/tkhd` for
    * the 16.16 fixed-point width/height, taking the max across tracks
    * (audio tracks carry 0×0). Frame decode needs a codec the
    * container doesn't ship, so features remain byte statistics — the
    * metadata (mime, dimensions, exact duration) is real. None when
    * the bytes are not ISO-BMFF — callers fall back to [[decodeStub]].
    */
  def decodeMp4(bytes: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 16) return None
    def be32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def typ(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (typ(4) != "ftyp") return None
    var timescale = 0L; var duration = -1L; var w = 0; var h = 0
    // Walk boxes in [start,end); depth-limit the recursion — box sizes
    // are untrusted and must always advance, never overflow Int range.
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && depth < 4) {
        val o = off.toInt
        val sz0 = be32(o)
        val t = typ(o + 4)
        var hdr = 8L
        val sz: Long =
          if (sz0 == 1L && off + 16 <= end) { hdr = 16L; be64(o + 8) }
          else if (sz0 == 0L) end - off
          else sz0
        if (sz < hdr) return // malformed: would not advance
        val payload = off + hdr
        val boxEnd = math.min(off + sz, end)
        t match {
          case "moov" | "trak" => walk(payload, boxEnd, depth + 1)
          case "mvhd" if payload + 4 <= boxEnd =>
            val ver = bytes(payload.toInt) & 0xff
            if (ver == 1 && payload + 32 <= boxEnd) {
              timescale = be32(payload.toInt + 20); duration = be64(payload.toInt + 24)
            } else if (ver == 0 && payload + 20 <= boxEnd) {
              timescale = be32(payload.toInt + 12); duration = be32(payload.toInt + 16)
            }
          case "tkhd" if payload + 4 <= boxEnd =>
            val ver = bytes(payload.toInt) & 0xff
            val dimOff = payload + 4 + (if (ver == 1) 84 else 72) // through matrix
            if (dimOff + 8 <= boxEnd) {
              w = math.max(w, (be32(dimOff.toInt) >> 16).toInt)   // 16.16 fixed
              h = math.max(h, (be32(dimOff.toInt + 4) >> 16).toInt)
            }
          case _ => ()
        }
        off += sz
      }
    }
    walk(0L, bytes.length.toLong, 0)
    if (timescale <= 0L || duration < 0L) None
    else Some(("video/mp4", w, h, duration * 1000L / timescale))
  }

  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Array[Float])] = {
    if (bytes == null || bytes.length < 8 || !looksLikeImage(bytes)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase
          val img = reader.read(0)
          val w = img.getWidth; val h = img.getHeight
          val step = math.max(1, math.sqrt(w.toLong * h / 4096.0).toInt)
          var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L; var sl2 = 0L
          var bright = 0L; var dark = 0L; var cnt = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              val l = (r + g + b) / 3
              sr += r; sg += g; sb += b; sl += l; sl2 += l.toLong * l
              if (l > 191) bright += 1
              if (l < 64) dark += 1
              cnt += 1
              x += step
            }
            y += step
          }
          val n = math.max(cnt, 1L).toDouble
          val meanL = sl / n
          val varL = math.max(0.0, sl2 / n - meanL * meanL)
          Some((s"image/$fmt", w, h, Array(
            (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
            (sb / n / 255.0).toFloat, (meanL / 255.0).toFloat,
            (math.sqrt(varL) / 255.0).toFloat,
            (w.toDouble / math.max(h, 1)).toFloat,
            (bright / n).toFloat, (dark / n).toFloat)))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Feature extraction over the binary column via mapPartitions:
    * batched iterator shape, init-per-partition, no shuffle. Output
    * appends `features array<float>`. `image` rows that decode with the
    * JDK codec get REAL features and their meta replaced with the
    * decoded mime/width/height; `audio` rows that parse as RIFF/WAVE
    * get REAL features and meta — `width` carries the channel count,
    * `height` the sample rate, `duration_ms` the exact duration (the
    * meta struct is modality-generic by design); everything else
    * (video, compressed audio, fake image bytes) flows through the
    * deterministic stub with meta untouched.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val kindIdx = media.schema.fieldIndex("kind")
    val metaIdx = media.schema.fieldIndex("meta")
    val ds: Dataset[Row] = media.mapPartitions { rows =>
      // per-partition init hook — where a heavier codec/model would be
      // loaded once per partition (NOT per row)
      val fallback: Array[Byte] => Array[Float] = decodeStub
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        // Blobs are untrusted web content: any decoder failure on one
        // row degrades to the stub instead of failing the task.
        val real = try {
          r.getString(kindIdx) match {
            case "image" => decodeImage(bytes).map { case (mime, w, h, f) =>
              (Row(mime, w, h, null), f) } // images have no duration
            case "audio" => decodeWav(bytes).map { case (mime, ch, rate, ms, f) =>
              (Row(mime, ch, rate, ms), f) }
            case "video" => decodeMp4(bytes).map { case (mime, w, h, ms) =>
              (Row(mime, w, h, ms), decodeStub(bytes)) } // real meta, stat features
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        real match {
          case Some((meta, feats)) =>
            Row.fromSeq(r.toSeq.updated(metaIdx, meta) :+ feats.toSeq)
          case None =>
            Row.fromSeq(r.toSeq :+ fallback(bytes).toSeq)
        }
      }
    }(enc)
    ds.toDF()
  }

  /** Frame sampling for video-like blobs: emit one row per sampled
    * frame offset (every `frameMs` of the meta duration). The decode of
    * each frame is the same STUB; the explode/partitioning shape is the
    * real thing.
    */
  def sampleFrames(media: DataFrame, frameMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video" || col("kind") === "image")
      .withColumn("frame_ms", explode(sequence(
        lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)), lit(frameMs))))
      .select(col("media_id"), col("frame_ms"), col("bytes"), col("meta"))

  /** REAL image resize (JDK-only: ImageIO decode → bilinear
    * Graphics2D scale → png re-encode): images whose longest side
    * exceeds `maxDim` are scaled down to fit (aspect preserved, never
    * upscaled) and their meta updated to the new dimensions + png
    * mime. Non-decodable payloads and non-image kinds pass through
    * byte-identical. Same mapPartitions shape as [[extractFeatures]] —
    * one iterator pass, no shuffle, codec state per partition; at
    * 100 TB this is the standard normalize-before-train step that runs
    * as a scan.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"resizeImages: maxDim must be positive, got $maxDim")
    val enc = org.apache.spark.sql.Encoders.row(media.schema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val kindIdx = media.schema.fieldIndex("kind")
    val metaIdx = media.schema.fieldIndex("meta")
    val ds: Dataset[Row] = media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(bytesIdx).asInstanceOf[Array[Byte]]
        val resized =
          if (r.getString(kindIdx) == "image") resizeOne(bytes, maxDim) else None
        resized match {
          case Some((png, w, h)) =>
            Row.fromSeq(r.toSeq
              .updated(bytesIdx, png)
              .updated(metaIdx, Row("image/png", w, h, null)))
          case None => r
        }
      }
    }(enc)
    ds.toDF()
  }

  /** Decode + scale + re-encode one payload; None when the bytes are
    * not a decodable image OR already fit within `maxDim` (caller
    * passes the original row through untouched — no lossy re-encode of
    * an image that didn't change size).
    */
  def resizeOne(bytes: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    if (bytes == null || bytes.length < 8 || !looksLikeImage(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (math.max(w, h) <= maxDim) return None
      val scale = maxDim.toDouble / math.max(w, h)
      val nw = math.max(1, math.round(w * scale).toInt)
      val nh = math.max(1, math.round(h * scale).toInt)
      val out = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some((bos.toByteArray, nw, nh))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
