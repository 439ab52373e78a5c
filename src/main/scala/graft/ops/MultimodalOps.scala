package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride the pipeline
  * as opaque `binary` columns with typed metadata, exactly like
  * bytea payloads ride the CDC envelope. The Spark-side plumbing —
  * schema, batched per-partition execution, feature/frame shapes —
  * is real, and so are the IMAGE codec ([[ImageIoDecoder]], pure-JDK
  * javax.imageio: decode, channel statistics, bilinear resize) and
  * the AUDIO codec ([[AudioWavDecoder]], pure-JDK javax.sound.sampled:
  * WAV/AU/AIFF → PCM statistics + frame seek table). Video decode
  * remains STUBBED behind [[MediaDecoder]] (no video codec ships with
  * the JDK): plug a JNI/Java codec in without touching the plan.
  *
  * Scale design: decode runs inside `mapPartitions` so each task
  * initialises its decoder once and streams its split — the Scala
  * analogue of `mapInPandas` batches. No driver collect, no shuffle;
  * parallelism = input splits.
  */
object MultimodalOps {

  /** The typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))

  def mediaSchema(idType: DataType = LongType): StructType = StructType(Seq(
    StructField("media_id", idType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Pluggable codec boundary. Implementations must be serializable
    * (instantiated per executor task). */
  trait MediaDecoder extends Serializable {
    /** Fixed-length feature vector for one payload. */
    def features(kind: String, payload: Array[Byte]): Array[Float]
    /** Byte offsets of sampled frames (video) — plumbing contract
      * for frame extraction. */
    def frameOffsets(payload: Array[Byte], everyNth: Int): Array[Long]
    /** Transcode the payload to the target dimensions; identity for
      * codecs that can't (the caller still rewrites metadata). */
    def resizePayload(payload: Array[Byte], w: Int, h: Int): Array[Byte] = payload
  }

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Features are byte statistics (mean/min/max/length buckets), so
    * tests exercise the full distributed path with stable outputs.
    */
  final class StubDecoder(featureDim: Int = 8) extends MediaDecoder {
    override def features(kind: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload.nonEmpty) {
        var i = 0
        while (i < payload.length) {
          out(i % featureDim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
        var j = 0
        while (j < featureDim) { out(j) = out(j) / payload.length * featureDim; j += 1 }
      }
      out
    }
    override def frameOffsets(payload: Array[Byte], everyNth: Int): Array[Long] =
      (0L until payload.length.toLong by everyNth.toLong).toArray

    /** Deterministic fake resize: byte decimation proportional to the
      * target area — STUB for a real scaler. */
    def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (payload.isEmpty) return payload
      val target = math.max(1, math.min(payload.length, w * h))
      val step = math.max(1, payload.length / target)
      payload.indices.by(step).map(payload).toArray
    }
    override def resizePayload(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      resizeStub(payload, w, h)
  }

  /** REAL image codec over `javax.imageio` — pure JDK, headless-safe,
    * no external libraries. Image payloads (PNG/JPEG/GIF/BMP — any
    * registered ImageIO reader) decode to pixels; the feature vector
    * is [width/4096, height/4096, aspect, mean R, mean G, mean B,
    * luma mean, luma stddev] (all but the first three in [0,1]).
    * Non-image kinds and undecodable payloads fall back to the
    * deterministic byte statistics of [[StubDecoder]], so a corrupt
    * blob degrades instead of failing the task. `resizePayload`
    * really scales: Graphics2D bilinear onto a target canvas,
    * re-encoded as PNG.
    */
  final class ImageIoDecoder(featureDim: Int = 8) extends MediaDecoder {
    private def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.isEmpty) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    override def features(kind: String, payload: Array[Byte]): Array[Float] = {
      val img = if (kind == "image") decode(payload) else None
      img match {
        case None => new StubDecoder(featureDim).features(kind, payload)
        case Some(im) =>
          val (w, h) = (im.getWidth, im.getHeight)
          var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              val r = ((rgb >> 16) & 0xff) / 255.0
              val g = ((rgb >> 8) & 0xff) / 255.0
              val b = (rgb & 0xff) / 255.0
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          val lumaMean = sl / n
          val lumaStd = math.sqrt(math.max(0.0, sl2 / n - lumaMean * lumaMean))
          val out = Array(w / 4096.0f, h / 4096.0f, w.toFloat / h,
            (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
            lumaMean.toFloat, lumaStd.toFloat)
          if (out.length >= featureDim) out.take(featureDim)
          else out ++ Array.fill(featureDim - out.length)(0.0f)
      }
    }

    // no JDK video codec: keep the stub's byte-stride offsets so the
    // frame-sampling PLAN stays exercised end to end
    override def frameOffsets(payload: Array[Byte], everyNth: Int): Array[Long] =
      (0L until payload.length.toLong by everyNth.toLong).toArray

    override def resizePayload(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      decode(payload) match {
        case None => payload // not an image: pass through untouched
        case Some(im) =>
          val target = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = target.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(target, "png", bos)
          bos.toByteArray
      }
  }

  /** REAL audio codec over `javax.sound.sampled` — pure JDK. WAV/AU/
    * AIFF payloads decode to PCM; the feature vector is
    * [sampleRate/48000, channels, duration_s, RMS, peak, zero-crossing
    * rate, mean, stddev] over the normalized [-1,1] samples. Non-audio
    * kinds and undecodable payloads fall back to [[StubDecoder]] byte
    * statistics (degrade, don't fail the task), mirroring
    * [[ImageIoDecoder]]. `frameOffsets` returns the byte offset of
    * every Nth PCM frame *after the header* — the real seek table an
    * audio chunker needs, not a byte stride.
    */
  final class AudioWavDecoder(featureDim: Int = 8) extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    private def pcmStream(payload: Array[Byte]) =
      if (payload == null || payload.isEmpty) None
      else try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
        val f = in.getFormat
        // normalise to signed 16-bit PCM so sample maths is uniform
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        Some(AudioSystem.getAudioInputStream(target, in))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    override def features(kind: String, payload: Array[Byte]): Array[Float] = {
      val pcm = if (kind == "audio") pcmStream(payload) else None
      pcm match {
        case None => new StubDecoder(featureDim).features(kind, payload)
        case Some(in) =>
          try {
            val fmt = in.getFormat
            val buf = new Array[Byte](8192)
            var n = 0L
            var (sum, sumSq, peak, crossings) = (0.0, 0.0, 0.0, 0L)
            var prevSign = 0
            var read = in.read(buf)
            while (read > 0) {
              var i = 0
              while (i + 1 < read) {
                // little-endian signed 16-bit
                val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort / 32768.0
                sum += s; sumSq += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
                if (prevSign != 0 && sign != prevSign) crossings += 1
                prevSign = sign
                n += 1
                i += 2
              }
              read = in.read(buf)
            }
            val samples = math.max(1L, n).toDouble
            val mean = sum / samples
            val rms = math.sqrt(sumSq / samples)
            val std = math.sqrt(math.max(0.0, sumSq / samples - mean * mean))
            val frames = n / math.max(1, fmt.getChannels)
            val out = Array(
              fmt.getSampleRate / 48000.0f, fmt.getChannels.toFloat,
              (frames / fmt.getSampleRate.toDouble).toFloat,
              rms.toFloat, peak.toFloat,
              (crossings / samples).toFloat, mean.toFloat, std.toFloat)
            if (out.length >= featureDim) out.take(featureDim)
            else out ++ Array.fill(featureDim - out.length)(0.0f)
          } finally in.close()
      }
    }

    /** Byte offsets of every Nth PCM frame relative to the decoded
      * stream start — header-aware (frame size × index), unlike the
      * stub's raw byte stride. */
    override def frameOffsets(payload: Array[Byte], everyNth: Int): Array[Long] =
      pcmStream(payload) match {
        case None => (0L until (if (payload == null) 0L else payload.length.toLong)
          by everyNth.toLong).toArray
        case Some(in) =>
          try {
            val frameSize = in.getFormat.getFrameSize.toLong
            val totalFrames = in.getFrameLength
            if (totalFrames <= 0) Array.empty[Long]
            else (0L until totalFrames by everyNth.toLong)
              .map(_ * frameSize).toArray
          } finally in.close()
      }
  }

  /** Decode features for every media row: batched per-partition
    * execution with one decoder per task. Output schema:
    * (media_id, kind, features array<float>).
    */
  def extractFeatures(
      media: DataFrame,
      decoder: MediaDecoder,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", media.schema("media_id").dataType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { rows =>
      // decoder initialised once per task; rows processed in batches
      // (the mapInPandas batch shape) to amortise any codec setup
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val meta = r.getStruct(metaIdx)
          val kind = if (meta == null) "unknown" else meta.getString(0)
          val payload = r.getAs[Array[Byte]](payloadIdx)
          Row(r.get(idIdx), kind,
            decoder.features(kind, if (payload == null) Array.emptyByteArray else payload))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling plan for video payloads: one output row per
    * sampled frame with its byte offset — the downstream shape for
    * per-frame feature extraction. */
  def sampleFrames(
      media: DataFrame,
      decoder: MediaDecoder,
      everyNth: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", media.schema("media_id").dataType),
      StructField("frame_index", IntegerType),
      StructField("byte_offset", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = r.getStruct(metaIdx)
        val isVideo = meta != null && meta.getString(0) == "video"
        if (!isVideo) Iterator.empty
        else {
          val payload = r.getAs[Array[Byte]](payloadIdx)
          decoder.frameOffsets(payload, everyNth).iterator.zipWithIndex.map {
            case (off, idx) => Row(r.get(idIdx), idx, off)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize/transcode plan: payload → transformed payload with
    * updated metadata, batched per partition like
    * [[extractFeatures]]. The stub decoder "resizes" by deterministic
    * byte decimation; a real codec slots in without changing the
    * plan, schema, or partitioning.
    */
  def resize(
      media: DataFrame,
      decoder: MediaDecoder,
      targetWidth: Int,
      targetHeight: Int,
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = media.schema
    val idIdx = schema.fieldIndex("media_id")
    val payloadIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val meta = r.getStruct(metaIdx)
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val resized = decoder.resizePayload(payload, targetWidth, targetHeight)
          Row(r.get(idIdx), resized,
            if (meta == null) null
            else Row(meta.getString(0), targetWidth, targetHeight,
              meta.get(3), meta.get(4)))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Declarative metadata checks that never touch the payload —
    * filters like these must prune on column stats alone so a 100 TB
    * media table is never materialised for a metadata query. */
  def wellFormed(media: DataFrame): DataFrame =
    media.where(
      col("payload").isNotNull && length(col("payload")) > 0 &&
        col("meta.kind").isin("image", "audio", "video"))
}
