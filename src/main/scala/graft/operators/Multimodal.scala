package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * transforms. New scope beyond the reference.
  *
  * The Spark-side shape is real and tested — schema, partition-preserving
  * mapPartitions with Encoders, per-row fan-out for frame sampling — while
  * the codec step is a clearly marked deterministic STUB (image/audio
  * libraries are not in this container). Swapping `stubDecode` for a real
  * decoder (e.g. javax.imageio / ffmpeg via mapPartitions) changes no plan
  * shape: decode stays a narrow per-partition pass, so at 100 TB it scales
  * with input splits and never shuffles the payload bytes.
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long, kind: String, bytes: Array[Byte], source: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, digest: String,
      width: Int, height: Int, embedding: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, offset_ms: Long, digest: String)

  /** Real binary-file source (images/audio on disk): path, mtime, length,
    * content — Spark's binaryFile format, partitioned by file splits.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Adapt the documents table into a media table (deterministic fake
    * payloads = UTF-8 bytes), for exercising the pipeline without binaries.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("source")).as[MediaItem]
  }

  /** STUB decode: deterministic pseudo-decode of the payload. A real
    * implementation would parse the container header and run the codec
    * here — same signature, same batch shape (iterator-to-iterator per
    * partition, no driver involvement, no shuffle).
    */
  private[operators] def stubDecode(item: MediaItem): MediaFeatures = {
    // null payload (e.g. a null source text upstream) decodes as empty
    // rather than NPE-ing the whole task
    val bytes = if (item.bytes == null) Array.emptyByteArray else item.bytes
    val h = java.util.Arrays.hashCode(bytes)
    val digest = f"${h}%08x"
    val dim = 8
    val emb = Array.tabulate(dim) { i =>
      // deterministic fake embedding from payload hash — STUB
      (((h * 31 + i * 2654435761L) % 1000) / 1000.0f)
    }
    MediaFeatures(item.media_id, item.kind, bytes.length.toLong, digest,
      width = 16 + math.abs(h % 1024), height = 16 + math.abs((h / 7) % 1024),
      embedding = emb)
  }

  /** Decode + feature-extract over partitions. Iterator-in/iterator-out so
    * a real decoder can batch per partition (model load once per task).
    */
  def decodeFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.map(stubDecode))
  }

  /** STUB resize: a real implementation decodes, scales to (w, h), and
    * re-encodes here. The stub keeps the contract a resizer must have —
    * deterministic output bytes, output dims = target dims, payload size
    * bounded by the target area — so downstream code (feature extraction,
    * packing) is exercised against realistic shapes.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    require(w > 0 && h > 0, "target dims must be positive")
    items.mapPartitions(_.map { item =>
      val f = stubDecode(item)
      // deterministic digest of (payload, target dims) — STUB re-encode
      val digest = f"${java.util.Arrays.hashCode(item.bytes) ^ (w * 31 + h)}%08x"
      // stub contract: a resized payload cannot exceed the target area
      // (3 bytes/pixel) — downstream packing must see post-resize sizes
      f.copy(width = w, height = h, digest = digest,
        n_bytes = math.min(f.n_bytes, w.toLong * h * 3))
    })
  }

  /** Frame sampling for video rows: fan out N evenly spaced pseudo-frames
    * per item (flatMap — a narrow 1→N expansion; real frame extraction
    * plugs into the same spot).
    */
  def sampleFrames(items: Dataset[MediaItem], n: Int = 4): Dataset[Frame] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(_.kind == "video").flatMap { item =>
      val h = java.util.Arrays.hashCode(item.bytes) // null-safe: hashCode(null) = 0
      (0 until n).iterator.map { i =>
        Frame(item.media_id, i, i * 1000L, f"${h ^ i}%08x") // STUB digest
      }
    }
  }
}
