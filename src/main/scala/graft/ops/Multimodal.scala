package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction / resize / frame-sampling run as
  * batch-shaped per-partition transforms (the Scala analog of
  * `mapInPandas` batches).
  *
  * The Spark-side plumbing — schemas, batch iteration, partition
  * preservation (no shuffle), output typing — is real and tested. The
  * codec calls themselves are STUBBED with a deterministic fake (this
  * container has no image/audio libraries): `FakeCodec` derives metadata
  * and features from the payload bytes. Swap `FakeCodec` for a real
  * JNI/javacv codec at deployment; every signature stays the same.
  */
object Multimodal {

  /** One media row: payload + declared modality. */
  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaMeta(media_id: Long, media_type: String, width: Int,
      height: Int, n_channels: Int, n_frames: Int, duration_ms: Long, size_bytes: Long)

  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** STUB codec: deterministic pseudo-decode from payload bytes. A real
    * implementation would call an image/audio/video library here (`???`
    * boundary); everything around it is production-shaped.
    */
  object FakeCodec {
    def decodeMeta(r: MediaRow): MediaMeta = {
      val len = r.payload.length.toLong
      val first = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
      val frames = r.media_type match {
        case "video" => (len % 24 + 1).toInt
        case "audio" => 1
        case _       => 1
      }
      MediaMeta(r.media_id, r.media_type,
        width = (64 + len % 577).toInt,
        height = (64 + (len + first) % 419).toInt,
        n_channels = if (r.media_type == "audio") 1 else 3,
        n_frames = frames,
        duration_ms = if (r.media_type == "image") 0L else len % 60000L,
        size_bytes = len)
    }

    /** 8-dim feature vector from a stable digest of the payload. */
    def features(r: MediaRow): MediaFeatures = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
      val f = (0 until 8).map { i =>
        val v = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
        v.toFloat / 65535.0f
      }.toArray
      MediaFeatures(r.media_id, f)
    }

    /** "Resize": truncate/pad payload to the target byte budget. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, targetBytes)
  }

  /** Decode metadata for every media row, batch-at-a-time per partition.
    * No shuffle: partitioning of the input is preserved.
    */
  def decodeMeta(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real codec would decode `batch` as one unit
        batch.iterator.map(FakeCodec.decodeMeta)
      }
    }
  }

  /** Feature extraction (e.g. embedding) per media row, batch-shaped. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(FakeCodec.features)))
  }

  /** Frame sampling for videos: one row per sampled frame index, stride
    * `everyNth`; non-videos pass through with frame_idx 0.
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    val meta = decodeMeta(media)
    meta.toDF().select(col("media_id"), col("media_type"), col("n_frames"),
      explode(sequence(lit(0L),
        greatest(col("n_frames") - 1, lit(0)).cast("long"), lit(everyNth.toLong)))
        .as("frame_idx"))
  }

  /** Build a media table from the documents fixture: payload = UTF-8 text
    * bytes, modality assigned deterministically by id (plumbing fixture —
    * stands in for real scraped media at 100 TB).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
