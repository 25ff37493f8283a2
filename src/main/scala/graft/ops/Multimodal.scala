package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payload + typed metadata struct, with
  * decode / feature-extraction as per-partition batch transforms.
  *
  * Image decode is REAL (`ImageIoKernel`, JDK ImageIO — PNG/BMP/GIF/
  * JPEG); audio decode is REAL (`AudioWavKernel`, JDK javax.sound —
  * WAV/AIFF/AU → PCM sample moments); video CONTAINER parsing is REAL
  * (`Mp4MetaKernel`, an ISO/IEC 14496-12 box walker — duration, track
  * layout, resolution, audio rate/channels from moov); video frame
  * PIXEL decode is REAL for MJPEG-in-AVI (`videoFrameDHash` — each
  * frame is a JPEG the JDK decodes; r13 item #6), while other codecs
  * (H.264 et al.) need a native decoder the JDK lacks and keep the
  * deterministic byte-histogram stand-in. The Spark-side contract:
  *  - schema: (id, modality, payload binary, meta struct(width, height,
  *    sample_rate, duration_ms, format));
  *  - partition-batch execution (`mapPartitions`, one kernel instance
  *    per partition — the JVM shape of pandas-batched UDFs);
  *  - feature output as `array<float>` ready for the Vectors ops.
  * At 100 TB: payloads stay columnar in parquet, scans prune metadata-
  * only queries to the meta struct (never touching payload pages), and
  * decode parallelism = partition count.
  */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("format", StringType)))

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MetaType)))

  /** Default ingest glob. Hadoop's GlobFilter is CASE-SENSITIVE, and
    * camera/Windows-originated crawls routinely carry .JPG/.PNG —
    * a lowercase-only glob silently drops them from the SCAN (worse
    * than a decode-drop: the row never exists). Mixed-case variants
    * beyond all-upper/all-lower stay out deliberately — the
    * combinatorial glob explodes; normalize exotic filenames upstream. */
  val ImageGlob: String =
    "*.{png,PNG,jpg,JPG,jpeg,JPEG,bmp,BMP,gif,GIF}"

  /** One decoded unit: the feature vector a downstream model consumes. */
  case class Features(id: Long, modality: String, features: Array[Float])

  /** Decode kernel contract: instantiated once per partition (amortizes
    * model/codec setup), fed payload batches. Real deployments plug an
    * image/audio decoder here. */
  trait DecodeKernel extends Serializable {
    def decode(modality: String, payload: Array[Byte],
               dim: Int): Array[Float]
  }

  /** Deterministic fake: byte histogram folded to `dim` floats — stands
    * in for a real decoder; keeps tests meaningful (shape, determinism,
    * null handling) without native libs. */
  object HistogramKernel extends DecodeKernel {
    def decode(modality: String, payload: Array[Byte],
               dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      out.map(_ / n)
    }
  }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG — no
    * native libs needed): features = [width, height, then a luminance
    * histogram over `dim−2` bins, normalized to sum 1]. Non-image
    * modalities and undecodable payloads fall back to the byte-histogram
    * stand-in, so mixed-modality tables decode in one pass.
    *
    * ImageIO is instantiated per call inside the partition — the kernel
    * object itself is stateless/serializable, and `mapPartitions` keeps
    * decode parallelism = partition count at scale. */
  object ImageIoKernel extends DecodeKernel {
    def decode(modality: String, payload: Array[Byte],
               dim: Int): Array[Float] = {
      if (modality != "image" || dim < 3)
        return HistogramKernel.decode(modality, payload, dim)
      val img =
        // NonFatal: JDK readers throw RuntimeExceptions on corrupt
        // payloads (CMMException etc.) — fall back, don't kill the job
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return HistogramKernel.decode(modality, payload, dim)
      val bins = dim - 2
      val out = new Array[Float](dim)
      out(0) = img.getWidth.toFloat
      out(1) = img.getHeight.toFloat
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          // ITU-R BT.601 integer luma from the sRGB-converted pixel
          val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
            + 114 * (rgb & 0xFF)) / 1000
          out(2 + lum * bins / 256) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = math.max(img.getWidth * img.getHeight, 1).toFloat
      var b = 2
      while (b < dim) { out(b) /= n; b += 1 }
      out
    }
  }

  /** Real audio decode via the JDK's javax.sound (WAV/AIFF/AU — no
    * native libs needed): any input encoding is converted to 16-bit
    * signed PCM, then features =
    * [sample_rate, channels, n_frames, mean, rms, zero_crossing_rate,
    *  then an amplitude histogram over `dim−6` bins on [−1,1]].
    * Mean/rms are over all channels in [−1,1] units; the crossing rate
    * is on the first channel (crossings / (frames−1)). Non-audio
    * modalities delegate to `ImageIoKernel` (which itself falls back to
    * the byte histogram), so ONE kernel instance decodes a
    * mixed-modality table in a single `mapPartitions` pass; undecodable
    * audio payloads fall back to the byte histogram too. */
  /** Decode any javax.sound-recognized payload to 16-bit little-
    * endian PCM: (sampleRate, channels, pcmBytes). ONE definition of
    * the conversion recipe for the feature kernel and the perceptual
    * hash — a divergent copy previously lived in each. None on
    * unrecognized containers, truncated streams, and recognized-but-
    * unconvertible codecs (WAV with a GSM/MPEG format tag throws
    * IAE from getAudioInputStream(pcmFmt, in) — one bad row must
    * fall back, not kill the job). */
  private[ops] def decodePcm16(payload: Array[Byte])
      : Option[(Float, Int, Array[Byte])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val base = in.getFormat
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        base.getSampleRate, 16, base.getChannels,
        base.getChannels * 2, base.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
      Some((base.getSampleRate, base.getChannels, pcm.readAllBytes()))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }
  }

  object AudioWavKernel extends DecodeKernel {
    def decode(modality: String, payload: Array[Byte],
               dim: Int): Array[Float] = {
      if (modality != "audio" || dim < 6)
        return ImageIoKernel.decode(modality, payload, dim)
      val samples = decodePcm16(payload).map { case (rate, chn, bytes) =>
        val out = new Array[Float](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = bytes(2 * i) & 0xFF
          val hi = bytes(2 * i + 1).toInt // sign-extends
          out(i) = ((hi << 8) | lo) / 32768.0f
          i += 1
        }
        (rate, chn, out)
      }
      samples match {
        case None =>
          HistogramKernel.decode(modality, payload, dim)
        case Some((rate, channels, s)) =>
          val out = new Array[Float](dim)
          val frames = if (channels > 0) s.length / channels else 0
          out(0) = rate
          out(1) = channels.toFloat
          out(2) = frames.toFloat
          if (s.nonEmpty) {
            var sum = 0.0; var sq = 0.0
            var i = 0
            while (i < s.length) { sum += s(i); sq += s(i) * s(i); i += 1 }
            out(3) = (sum / s.length).toFloat
            out(4) = math.sqrt(sq / s.length).toFloat
            var zc = 0; var f = 1
            while (f < frames) { // first channel: stride = channels
              if ((s((f - 1) * channels) < 0f) != (s(f * channels) < 0f))
                zc += 1
              f += 1
            }
            if (frames > 1) out(5) = zc.toFloat / (frames - 1)
            val bins = dim - 6
            if (bins > 0) {
              i = 0
              while (i < s.length) {
                val b = (((s(i) + 1.0f) / 2.0f) * bins).toInt
                out(6 + math.min(math.max(b, 0), bins - 1)) += 1.0f
                i += 1
              }
              var b2 = 6
              while (b2 < dim) { out(b2) /= s.length; b2 += 1 }
            }
          }
          out
      }
    }
  }

  /** Parsed MP4 (ISO base media) container metadata. */
  private[ops] case class Mp4Meta(durationMs: Long, nTracks: Int,
    width: Int, height: Int, audioRate: Int, audioChannels: Int,
    hasVideo: Boolean, hasAudio: Boolean)

  /** Real video CONTAINER decode: a pure-JVM ISO/IEC 14496-12 (MP4 /
    * ISO base media file format) box walker. The box grammar is a
    * public spec: [size u32 | 1 → largesize u64][fourcc], containers
    * (`moov`/`trak`/`mdia`/`minf`/`stbl`) nest, leaves carry
    * version-tagged payloads. Extracted: presentation duration
    * (`mvhd` timescale+duration), track count, first video track's
    * coded resolution (`stsd` sample entry — authoritative pixel
    * dims, vs tkhd's post-matrix display size), first audio track's
    * sample rate and channel count (`stsd` audio entry).
    *
    * features = [duration_ms, n_tracks, width, height, audio_rate,
    * audio_channels, has_video, has_audio, then a byte histogram over
    * `dim−8` bins] — frame PIXEL decode needs a codec the JDK lacks,
    * so the histogram tail keeps the vector shape useful for the ANN
    * ops downstream. Non-video modalities delegate to
    * `AudioWavKernel` (→ `ImageIoKernel` → `HistogramKernel`), so ONE
    * kernel instance decodes a mixed-modality table in a single
    * `mapPartitions` pass; non-MP4 / truncated payloads fall back to
    * the byte histogram. */
  object Mp4MetaKernel extends DecodeKernel {
    def decode(modality: String, payload: Array[Byte],
               dim: Int): Array[Float] = {
      if (modality != "video" || dim < 8)
        return AudioWavKernel.decode(modality, payload, dim)
      parseMp4(payload) match {
        case None => HistogramKernel.decode(modality, payload, dim)
        case Some(m) =>
          val out = new Array[Float](dim)
          out(0) = m.durationMs.toFloat
          out(1) = m.nTracks.toFloat
          out(2) = m.width.toFloat
          out(3) = m.height.toFloat
          out(4) = m.audioRate.toFloat
          out(5) = m.audioChannels.toFloat
          out(6) = if (m.hasVideo) 1f else 0f
          out(7) = if (m.hasAudio) 1f else 0f
          val bins = dim - 8
          if (bins > 0 && payload.length > 0) {
            var i = 0
            while (i < payload.length) {
              out(8 + java.lang.Byte.toUnsignedInt(payload(i)) % bins) += 1f
              i += 1
            }
            var b = 8
            while (b < dim) { out(b) /= payload.length; b += 1 }
          }
          out
      }
    }
  }

  /** ISO-BMFF walker. Returns None unless the payload starts with a
    * well-formed top-level box list containing a `moov` with a valid
    * `mvhd` — the "is this actually an MP4" gate. All reads are
    * bounds-checked; any structural violation aborts to None (one bad
    * row must fall back, never kill the partition). */
  private[ops] def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def u16(at: Int): Int = buf.getShort(at) & 0xFFFF
    def u32(at: Int): Long = buf.getInt(at) & 0xFFFFFFFFL
    def fourcc(at: Int): String =
      new String(bytes, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

    var durationMs = -1L
    var nTracks = 0
    var width = 0; var height = 0
    var audioRate = 0; var audioChannels = 0
    var hasVideo = false; var hasAudio = false
    var sawMoov = false

    // per-trak scratch, committed when the trak box closes
    var trakHandler = ""
    var trakW = 0; var trakH = 0; var trakRate = 0; var trakCh = 0

    def walk(start: Long, end: Long, depth: Int): Boolean = {
      if (depth > 8) return false // spec nesting is ~6; cycles bail
      var p = start
      while (p < end) {
        if (p + 8 > end) return false
        var size = u32(p.toInt)
        var hdr = 8L
        if (size == 1L) { // 64-bit largesize
          if (p + 16 > end) return false
          size = buf.getLong(p.toInt + 8); hdr = 16L
        } else if (size == 0L) size = end - p // box runs to end
        if (size < hdr || p + size > end) return false
        val typ = fourcc(p.toInt + 4)
        val cs = p + hdr // content start
        val ce = p + size
        typ match {
          case "moov" =>
            sawMoov = true
            if (!walk(cs, ce, depth + 1)) return false
          case "trak" =>
            trakHandler = ""; trakW = 0; trakH = 0; trakRate = 0; trakCh = 0
            if (!walk(cs, ce, depth + 1)) return false
            nTracks += 1
            if (trakHandler == "vide") {
              hasVideo = true
              if (width == 0) { width = trakW; height = trakH }
            } else if (trakHandler == "soun") {
              hasAudio = true
              if (audioRate == 0) { audioRate = trakRate
                audioChannels = trakCh }
            }
          case "mdia" | "minf" | "stbl" =>
            if (!walk(cs, ce, depth + 1)) return false
          case "mvhd" =>
            if (ce - cs < 4) return false
            val v = bytes(cs.toInt) & 0xFF
            // v0: verflags,c,m = 12 bytes then ts u32, dur u32
            // v1: verflags + 8 + 8 then ts u32, dur u64
            // all-ones duration = "unknown" per §8.2.2.3 (fMP4/live
            // segments) — report 0, not a ~50-day garbage feature
            if (v == 0) {
              if (ce - cs < 20) return false
              val ts = u32(cs.toInt + 12); val dur = u32(cs.toInt + 16)
              if (ts > 0)
                durationMs =
                  if (dur == 0xFFFFFFFFL) 0L else dur * 1000L / ts
            } else {
              if (ce - cs < 32) return false
              val ts = u32(cs.toInt + 20)
              val dur = buf.getLong(cs.toInt + 24)
              // negative = all-ones sentinel or malformed; cap so
              // dur*1000 cannot overflow Long into garbage
              if (ts > 0)
                durationMs =
                  if (dur < 0 || dur > Long.MaxValue / 1000) 0L
                  else dur * 1000L / ts
            }
          case "hdlr" =>
            if (ce - cs >= 12) trakHandler = fourcc(cs.toInt + 8)
          case "stsd" =>
            // verflags u32, entry_count u32, then sample entries; the
            // first entry decides the track's codec parameters
            if (ce - cs >= 16 && u32(cs.toInt + 4) >= 1) {
              val e = cs + 8 // first entry: size u32, format fourcc
              val esize = u32(e.toInt)
              if (esize >= 16 && e + esize <= ce) {
                // visual entry: 16B entry header + 16B pre_defined/
                // reserved, then width u16 @+32, height u16 @+34
                if (esize >= 36) { trakW = u16(e.toInt + 32)
                  trakH = u16(e.toInt + 34) }
                // audio entry: 16B header + 8B reserved, channels u16
                // @+24, samplesize @+26, pre/res @+28, rate 16.16 @+32
                if (esize >= 36) {
                  trakCh = u16(e.toInt + 24)
                  trakRate = (u32(e.toInt + 32) >> 16).toInt
                }
              }
            }
          case _ => // ftyp/mdat/free/udta/…: opaque here
        }
        p += size
      }
      true
    }

    try {
      if (bytes.length < 16) None
      // an MP4 opens with a box whose fourcc is ASCII; cheap pre-gate
      else if (!walk(0L, bytes.length.toLong, 0)) None
      else if (!sawMoov || durationMs < 0) None
      else Some(Mp4Meta(durationMs, nTracks, width, height, audioRate,
        audioChannels, hasVideo, hasAudio))
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Feature extraction over a multimodal table: one kernel per
    * partition, null payloads dropped, output typed for ANN ops. */
  def extractFeatures(df: DataFrame, dim: Int,
                      kernel: DecodeKernel = HistogramKernel)
                     : Dataset[Features] = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.collect { case (id, mod, payload) if payload != null =>
          Features(id, mod, kernel.decode(mod, payload, dim))
        }
      }
  }

  /** Metadata-only projection — never touches payload bytes (column
    * pruning keeps the binary pages unread in parquet). */
  def metaStats(df: DataFrame): DataFrame =
    df.groupBy("modality").agg(
      count(lit(1)).as("n"),
      avg(col("meta.width")).as("avg_width"),
      avg(col("meta.duration_ms")).as("avg_duration_ms"))

  /** Frame-sampling shape for video: explode `n` evenly-spaced frame
    * indices per row (the decode of each frame happens in
    * extractFeatures-style kernels downstream). */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(transform(sequence(lit(0), lit(n - 1)),
        i => ((i * coalesce(col("meta.duration_ms"), lit(0L))) / n)
          .cast("long"))))

  /** 64-bit difference hash (dHash) of an image payload: ImageIO
    * decode, average-pool integer luma onto a 9×8 grid in PURE integer
    * arithmetic (bit-for-bit reproducible on any JVM — no float
    * resampling, no Graphics2D interpolation nondeterminism), then one
    * bit per horizontally-adjacent cell pair (`grid[y][x] <
    * grid[y][x+1]`). The relative-comparison construction makes the
    * hash invariant to uniform brightness/contrast shifts and — via
    * the pooled grid — to resizing; it is the standard public dHash
    * scheme from the perceptual-hashing literature. None for
    * undecodable/empty payloads. */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    val img =
      // NonFatal, not just IOException: the JDK image readers throw
      // RuntimeExceptions on recognized-but-corrupt payloads (bad ICC
      // profile → CMMException, malformed BMP/GIF headers →
      // NegativeArraySize/ArrayIndexOutOfBounds) — one corrupt crawl
      // image must drop the row, not kill the job
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val w = img.getWidth; val h = img.getHeight
    val grid = Array.ofDim[Long](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        // cell bounds by integer proration; tiny images (w<9 / h<8)
        // degenerate to ≥1-pixel cells clamped in-range, so every cell
        // is non-empty and the division below is safe
        val x0 = math.min(cx * w / 9, w - 1)
        val x1 = math.max(x0 + 1, math.min((cx + 1) * w / 9, w))
        val y0 = math.min(cy * h / 8, h - 1)
        val y1 = math.max(y0 + 1, math.min((cy + 1) * h / 8, h))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 integer luma — same formula as ImageIoKernel
            sum += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
              + 114 * (rgb & 0xFF)) / 1000
            x += 1
          }
          y += 1
        }
        grid(cy)(cx) = sum / ((x1 - x0).toLong * (y1 - y0))
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      val y = b / 8; val x = b % 8
      if (grid(y)(x) < grid(y)(x + 1)) bits |= (1L << b)
      b += 1
    }
    Some(bits)
  }

  /** Image RESIZE kernel: decode via ImageIO, downscale to fit inside
    * (maxW, maxH) preserving aspect ratio, re-encode PNG. The
    * downscale is an integer BOX FILTER (per-channel average-pooling
    * with integer proration — dHash's discipline): pixel values are
    * bit-for-bit reproducible on any JVM, with none of Graphics2D's
    * interpolation nondeterminism. (The PNG *container* bytes are the
    * JDK encoder's and can differ across JDK versions; the decoded
    * pixels are the deterministic contract.) Images already inside
    * the box pass through BYTE-IDENTICAL (no decode/re-encode loss —
    * the common case in a crawl where most assets are small).
    * Undecodable payloads return None; upscaling never happens.
    * Returns (payload', width', height'). */
  def resizeImage(payload: Array[Byte], maxW: Int,
                  maxH: Int): Option[(Array[Byte], Int, Int)] = {
    require(maxW >= 1 && maxH >= 1, s"target box ${maxW}x$maxH")
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
      return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= maxW && h <= maxH) return Some((payload, w, h))
    // integer aspect-preserving fit: scale by the tighter axis,
    // floor, clamp to >=1 (a 1000x1 banner at 64x64 stays 64x1)
    val tw = math.max(1, math.min(maxW.toLong, w.toLong * maxH / h)
      .min(w.toLong).toInt)
    val th = math.max(1, math.min(maxH.toLong, h.toLong * maxW / w)
      .min(h.toLong).toInt)
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < th) {
      var cx = 0
      while (cx < tw) {
        val x0 = math.min(cx.toLong * w / tw, w - 1).toInt
        val x1 = math.max(x0 + 1,
          math.min((cx + 1).toLong * w / tw, w).toInt)
        val y0 = math.min(cy.toLong * h / th, h - 1).toInt
        val y1 = math.max(y0 + 1,
          math.min((cy + 1).toLong * h / th, h).toInt)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
            sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        out.setRGB(cx, cy, (((sr / n).toInt & 0xFF) << 16) |
          (((sg / n).toInt & 0xFF) << 8) | ((sb / n).toInt & 0xFF))
        cx += 1
      }
      cy += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", buf)
    Some((buf.toByteArray, tw, th))
  }

  /** Full rows + `payload` replaced by its resized form, plus
    * (width, height, resized) — ONE decode pass, mapPartitions, no
    * payload shuffle (the extractFeatures/withDHash shape). Non-image
    * and undecodable rows pass through untouched with resized=false
    * and null dims, so a mixed-modality table survives the pass. */
  def resizeImages(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val schema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("resized", org.apache.spark.sql.types.BooleanType)
    val modIdx = df.schema.fieldIndex("modality")
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.toSeq.toArray
        val mod = r.getString(modIdx)
        val payload =
          if (r.isNullAt(payIdx)) null else r.getAs[Array[Byte]](payIdx)
        val extra: Seq[Any] =
          if (mod != "image" || payload == null) Seq(null, null, false)
          else resizeImage(payload, maxW, maxH) match {
            case None => Seq(null, null, false)
            case Some((p2, w2, h2)) =>
              val changed = !(p2 eq payload)
              vals(payIdx) = p2
              Seq(w2, h2, changed)
          }
        org.apache.spark.sql.Row.fromSeq(vals.toSeq ++ extra)
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(
      schema))
  }

  /** Full rows + appended `phash`, ONE decode pass over the payload
    * column (mapPartitions, no self-join, no payload shuffle) —
    * for consumers that need the original columns alongside the hash
    * (the streaming dedup sink). Non-image / undecodable rows drop.
    * When only (id, hash) is needed, use [[imageDHash]] instead: its
    * narrow projection lets parquet skip payload pages entirely on
    * hash-only passes. */
  def withDHash(df: DataFrame): DataFrame = {
    val schema = df.schema.add("phash", LongType)
    val modIdx = df.schema.fieldIndex("modality")
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val mod = r.getString(modIdx)
        val payload =
          if (r.isNullAt(payIdx)) null else r.getAs[Array[Byte]](payIdx)
        if (mod != "image" || payload == null) Iterator.empty
        else dHash64(payload)
          .map(h => Row.fromSeq(r.toSeq :+ h)).iterator
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** MJPEG frame payloads out of an AVI (RIFF) container — the one
    * mainstream video codec the JDK can decode to REAL pixels,
    * because each frame is simply a JPEG (ISO/IEC 10918) and ImageIO
    * ships a JPEG reader. RIFF walk: `RIFF…AVI ` → nested `LIST`
    * boxes (`movi` holds the stream data, `rec ` groups interleaved
    * chunks) → stream chunks whose fourcc ends `dc`/`db` (compressed/
    * uncompressed video data, '##dc' per the AVI spec) and whose
    * payload opens with the JPEG SOI marker. Chunks pad to even
    * offsets; every size read is bounds-checked so a truncated or
    * hostile payload yields the frames before the damage, never an
    * OOB read. Non-AVI bytes → no frames (the caller's skip row). */
  private[ops] def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def u32le(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val out = Seq.newBuilder[Array[Byte]]
    // Explicit-stack DFS, not recursion: a crafted AVI of deeply
    // nested 12-byte LIST headers (~a few hundred KB of input) would
    // otherwise StackOverflowError the executor — a crash, which the
    // "hostile payload yields the frames before the damage" contract
    // forbids just as much as an OOB read. Each stack entry is a
    // (cursor, end) range still to scan; descending into a LIST
    // pushes the continuation first, then the list body, so frames
    // emit in exact document (depth-first) order — frame_idx is
    // positional and must not depend on the walk's implementation.
    def walk(start0: Int, end0: Int): Unit = {
      var stack = List((start0, end0))
      while (stack.nonEmpty) {
        var (p, end) = stack.head
        stack = stack.tail
        var descend = false
        while (!descend && p + 8 <= end) {
          val cc = fourcc(p)
          val sz = u32le(p + 4)
          if (sz < 0 || p + 8 + sz > end) {
            p = end // truncated: keep prior frames, abandon this range
          } else {
            val body = p + 8
            val next = body + sz.toInt + (sz.toInt & 1) // pad to even
            if (cc == "RIFF" || cc == "LIST") {
              // first 4 body bytes are the list type; contents follow
              if (sz >= 4) {
                stack = (next, end) :: stack // continuation after child
                stack = (body + 4, body + sz.toInt) :: stack
                descend = true
              } else p = next
            } else {
              if (cc.length == 4 && sz >= 2 &&
                  (cc.endsWith("dc") || cc.endsWith("db")) &&
                  (bytes(body) & 0xff) == 0xff &&
                  (bytes(body + 1) & 0xff) == 0xd8)
                out += java.util.Arrays.copyOfRange(
                  bytes, body, body + sz.toInt)
              p = next
            }
          }
        }
      }
    }
    if (bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      walk(12, math.min(bytes.length, 8 + u32le(4).toInt))
    out.result()
  }

  /** Per-FRAME perceptual hashes for MJPEG-in-AVI video payloads —
    * real pixels (ImageIO JPEG decode per frame), the op that closes
    * the last multimodal stand-in: (id, frame_idx, phash), dHash64's
    * exact scheme so video frames and still images dedup in ONE hash
    * space (a keyframe reposted as a thumbnail collides). One
    * mapPartitions pass, no payload shuffle; non-AVI codecs (no JDK
    * decoder) and undecodable frames drop — their container metadata
    * still flows through `Mp4MetaKernel`. */
  def videoFrameDHash(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, mod, payload) =>
          if (mod != "video" || payload == null) Iterator.empty
          else aviMjpegFrames(payload).iterator.zipWithIndex.flatMap {
            case (jpg, i) => dHash64(jpg).map(h => (id, i.toLong, h))
          }
        }
      }
      .toDF("id", "frame_idx", "phash")
  }

  /** (id, phash) table over a multimodal frame: one ImageIO decode
    * pass via mapPartitions (decode parallelism = partition count),
    * non-image / undecodable rows dropped. The 8-byte hash is the
    * whole downstream footprint — payload pages are never read again
    * by the dedup path. */
  def imageDHash(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, mod, payload) =>
          if (mod != "image" || payload == null) Iterator.empty
          else dHash64(payload).map(h => (id, h)).iterator
        }
      }
      .toDF("id", "phash")
  }

  /** Image-directory ingestion: Spark's `binaryFile` source → the
    * multimodal schema (payload = file bytes; meta.format from the
    * extension; width/height stay null until a decode pass fills
    * them). Per-file parallelism is the source's own partitioning —
    * at corpus scale the scan splits across executors like any file
    * source — and `pathGlobFilter` keeps non-image files out of the
    * scan entirely (never read, not read-and-dropped). id is the
    * first 60 bits of md5(path): deterministic across runs and
    * engines, collision odds ~n²/2⁶¹ — negligible below ~10⁸ files
    * per ingested directory tree. */
  def readImages(spark: org.apache.spark.sql.SparkSession, dir: String,
                 glob: String = ImageGlob): DataFrame =
    toMultimodal(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir))

  /** Streaming twin of [[readImages]]: picks up image files as they
    * land (the crawl-output watcher), same schema. Streaming file
    * sources need the schema declared; binaryFile's is fixed by the
    * format. */
  def readImageStream(spark: org.apache.spark.sql.SparkSession,
                      dir: String,
                      glob: String = ImageGlob)
      : DataFrame =
    toMultimodal(spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")
      .option("pathGlobFilter", glob)
      .load(dir))

  private def toMultimodal(files: DataFrame): DataFrame =
    files.select(
      expr("CAST(conv(substr(md5(path), 1, 15), 16, 10) AS BIGINT)")
        .as("id"),
      lit("image").as("modality"),
      col("content").as("payload"),
      struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
          .as("format")).as("meta"),
      col("path"))

  /** 64-bit audio ENVELOPE hash — the audio analog of [[dHash64]]:
    * decode to PCM (javax.sound, any JDK-supported container), pool
    * the first channel's absolute amplitude into 65 equal windows,
    * then one bit per adjacent-window comparison (env[i] < env[i+1]).
    * The relative-comparison construction makes the hash
    * APPROXIMATELY invariant to uniform gain changes and robust to
    * resampling — approximately, not exactly: gain is multiplicative,
    * so integer quantization can flip a bit whose two windows were
    * near-ties (dHash's brightness invariance is exact because an
    * additive shift survives integer pooling unchanged). Near-tie
    * flips land within the Hamming ≤ 3 band-join budget rather than
    * defeating it. Same 64-bit key space as dHash, so
    * [[phashNearDup]]/[[phashClusters]] serve both modalities
    * unchanged. None for undecodable audio or clips shorter than 65
    * frames. Memory: the decoded PCM byte buffer is the only
    * clip-sized allocation — windows pool straight out of it (65 long
    * accumulators), no per-frame array. */
  def audioEnvHash64(payload: Array[Byte]): Option[Long] = {
    decodePcm16(payload) match {
      case None => None
      case Some((_, channels, bytes)) =>
      val ch = math.max(channels, 1)
      val n = bytes.length / 2 / ch // frames
      if (n < 65) None
      else {
        // integer average-pool the first channel's |amplitude| into 65
        // windows, reading frames straight from the PCM buffer (same
        // proration as the dHash grid; every window non-empty)
        val env = new Array[Long](65)
        var wdx = 0
        while (wdx < 65) {
          val a = math.min(wdx * n / 65, n - 1)
          val b = math.max(a + 1, math.min((wdx + 1) * n / 65, n))
          var sum = 0L
          var f = a
          while (f < b) {
            val i = f * ch * 2
            val lo = bytes(i) & 0xFF
            val hi = bytes(i + 1).toInt // sign-extends
            sum += math.abs(((hi << 8) | lo).toLong)
            f += 1
          }
          env(wdx) = sum / (b - a)
          wdx += 1
        }
        var bits = 0L
        var i = 0
        while (i < 64) {
          if (env(i) < env(i + 1)) bits |= (1L << i)
          i += 1
        }
        Some(bits)
      }
    }
  }

  /** (id, phash) table for AUDIO rows — [[imageDHash]]'s twin over
    * [[audioEnvHash64]]; output feeds the same near-dup band join
    * and clustering. */
  def audioEnvHash(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, mod, payload) =>
          if (mod != "audio" || payload == null) Iterator.empty
          else audioEnvHash64(payload).map(h => (id, h)).iterator
        }
      }
      .toDF("id", "phash")
  }

  /** Image near-dup CLUSTERS: the band-bucketed pairs fed through the
    * same pointer-jumping connected-components the text path uses
    * (`Dedup.connectedComponents`) — (id, cluster) with singletons
    * self-labeled, so keep-one / keep-best policies compose exactly
    * like their text twins. One decode pass, 8 bytes per image
    * downstream, cluster cost bounded by band-bucket sizes. */
  def phashClusters(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val pairs = phashNearDup(hashes, maxDist)
    val labels = graft.ops.Dedup
      .connectedComponents(pairs, "id_a", "id_b")
    hashes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("id")).as("cluster"))
  }

  /** UNIFIED visual near-dup clusters — video FRAMES and still
    * images in ONE hash space and ONE clustering (r14 verdict #3:
    * `videoFrameDHash` deliberately emits dHash64's exact scheme so a
    * keyframe reposted as a thumbnail collides, but until this op
    * nothing COMPOSED the two sides). Every decodable frame
    * contributes a hash row under its VIDEO's media id; stills
    * contribute theirs; the combined table rides the same band join +
    * pointer-jumping CC as the image-only path, so (id, cluster)
    * comes back at MEDIA granularity — a video whose any-frame is
    * within Hamming ≤ `maxDist` of a still (or of another video's
    * frame) shares its cluster, and keep-one/keep-best policies
    * compose unchanged. Scale shape: one decode pass per modality
    * (no payload shuffle), band-bucketed pairs, id-level distinct
    * before the label join (a video is many hash rows but ONE
    * cluster member). */
  def visualClusters(df: DataFrame, maxDist: Int = 3): DataFrame = {
    val hashes = imageDHash(df).unionByName(
      videoFrameDHash(df).select(col("id"), col("phash")))
    val pairs = phashNearDup(hashes, maxDist)
    val labels = graft.ops.Dedup
      .connectedComponents(pairs, "id_a", "id_b")
    hashes.select(col("id")).distinct()
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("id")).as("cluster"))
  }

  /** Row-level visual hash for the LIVE dedup gate: image → dHash,
    * video → dHash of its FIRST decodable MJPEG frame (the keyframe —
    * deterministic, one JPEG decode per video row), other/undecodable
    * rows drop. One hash PER ROW because the streaming equality gate
    * anti-joins on a single persisted key column; the full
    * frames ∪ stills Hamming-band clustering stays the batch pass
    * ([[visualClusters]]) over the standing sink, per the
    * imageDedupStream cost note. */
  def withVisualHash(df: DataFrame): DataFrame = {
    val schema = df.schema.add("phash", LongType)
    val modIdx = df.schema.fieldIndex("modality")
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val mod = r.getString(modIdx)
        val payload =
          if (r.isNullAt(payIdx)) null else r.getAs[Array[Byte]](payIdx)
        val h: Option[Long] =
          if (payload == null) None
          else mod match {
            case "image" => dHash64(payload)
            case "video" =>
              aviMjpegFrames(payload).view.flatMap(dHash64).headOption
            case _ => None
          }
        h.map(v => Row.fromSeq(r.toSeq :+ v)).iterator
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Near-duplicate image candidate pairs at Hamming distance ≤
    * `maxDist` over (id, phash): the LSH band trick on the 64-bit
    * dHash — 4 × 16-bit bands, so any two hashes within Hamming ≤ 3
    * MUST share at least one untouched band (pigeonhole) and recall is
    * EXACT for maxDist ≤ 3; the join is band-bucketed (shuffle keyed on
    * (band, 16-bit value) — never all-pairs) and the distance check is
    * exact (`bit_count(xor)`), so false band collisions cost only the
    * in-bucket probe. Same candidate-generation shape as the text
    * MinHash path (`Dedup`): buckets bound the quadratic term. */
  def phashNearDup(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"maxDist=$maxDist > 3 breaks the 4-band pigeonhole recall " +
        "guarantee; raise the band count instead")
    val banded = hashes.select(col("id"), col("phash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bkey",
        expr("(phash >> (16 * band)) & 65535"))
    val a = banded.select(col("band"), col("bkey"),
      col("id").as("id_a"), col("phash").as("h_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("id").as("id_b"), col("phash").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("int").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }
}
