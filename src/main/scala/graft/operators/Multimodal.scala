package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads ride as opaque `binary` columns
  * next to a typed metadata struct, exactly like an image/audio lake
  * table. Decode / feature-extraction runs per partition in bounded
  * batches so a 100 TB scan streams — no payload ever collects to the
  * driver, and partition size (spark.sql.files.maxPartitionBytes)
  * bounds executor memory, not row count.
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libraries): `StubDecoder` produces deterministic fake features from
  * the payload bytes, and `RealDecoder` marks where a JNI/library
  * decoder would plug in. The Spark-side plumbing — schema, batching,
  * partitioning, typed Dataset API — is real and tested.
  */
object Multimodal {

  case class MediaMeta(format: String, widthPx: Int, heightPx: Int,
                       durationMs: Long)
  case class MediaRecord(mediaId: Long, kind: String, payload: Array[Byte],
                         meta: MediaMeta)
  case class MediaFeatures(mediaId: Long, kind: String, nBytes: Int,
                           features: Array[Float])

  /** Pluggable payload decoder. Implementations must be Serializable —
    * they ship to executors. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** Deterministic fake decoder: 8 features folded from payload bytes.
    * Stands in for a real image/audio codec in this offline container. */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        acc(i % 8) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Where a real codec (libjpeg/ffmpeg via JNI, etc.) would plug in.
    * Intentionally unimplemented here — no media libraries in-container. */
  object RealDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] =
      throw new NotImplementedError(
        "real media codecs are not available in this environment; use StubDecoder")
  }

  /** Deterministically lift the documents table into a media table:
    * payload = utf-8 text bytes, metadata derived from stable columns.
    * (Driver testdata has no true binary column; the lake-table shape —
    * binary + struct — is what matters.) */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("mediaId"),
      lit("text").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("utf-8").as("format"),
        (pmod(col("doc_id") * 37, lit(1024)) + 64).cast("int").as("widthPx"),
        (pmod(col("doc_id") * 53, lit(768)) + 64).cast("int").as("heightPx"),
        (length(col("text")) * 40L).cast("long").as("durationMs")).as("meta"))

  case class Frame(mediaId: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** Frame sampling: each media row explodes into every `everyK`-th
    * fixed-size frame of its payload — the video-to-training-frames
    * shape. One row fans out to many, but frames are emitted through
    * the iterator, so per-task memory is one payload + one frame, never
    * the whole fan-out. A real implementation swaps the byte-slicing
    * for a container demuxer; the distribution shape is identical. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % everyK == 0 => Frame(r.mediaId, idx, frame)
      }
    }
  }

  /** Resize stub: metadata updated to the target box; the payload is
    * deterministically resampled (byte stride) in place of a real
    * pixel-domain scaler. Aspect-preserving fit into (maxW, maxH). */
  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / r.meta.widthPx, maxH.toDouble / r.meta.heightPx))
      val w = math.max(1, (r.meta.widthPx * scale).toInt)
      val h = math.max(1, (r.meta.heightPx * scale).toInt)
      val keep = math.max(1, (r.payload.length * scale * scale).toInt)
      val stride = math.max(1.0, r.payload.length.toDouble / keep)
      val out = Array.tabulate(math.min(keep, r.payload.length))(i =>
        r.payload((i * stride).toInt.min(r.payload.length - 1)))
      r.copy(payload = out, meta = r.meta.copy(widthPx = w, heightPx = h))
    }
  }

  /** Batched per-partition feature extraction over the typed Dataset.
    * `batchSize` bounds live decoded rows per task; the iterator shape
    * keeps Spark's spill/stream machinery in charge of everything else. */
  def extractFeatures(media: Dataset[MediaRecord], decoder: MediaDecoder,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.mediaId, r.kind, r.payload.length,
            decoder.decode(r.payload, r.meta))
        }
      }
    }
  }
}
