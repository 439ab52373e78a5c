package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video ride the pipeline
  * as opaque `binary` columns with typed metadata, exactly like
  * bytea payloads ride the CDC envelope. The Spark-side plumbing —
  * schema, batched per-partition execution, feature/frame shapes —
  * is real; the codec itself is STUBBED behind [[MediaDecoder]]
  * (no image/audio libraries in this environment): plug in a real
  * JNI/Java codec without touching the plan.
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
          val resized = decoder match {
            case s: StubDecoder => s.resizeStub(payload, targetWidth, targetHeight)
            case _ => payload // real codecs override via StubDecoder-like hooks
          }
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
