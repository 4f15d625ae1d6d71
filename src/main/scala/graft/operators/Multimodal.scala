package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata — the schema,
  * partition behavior, and batch shape are real and tested; only the codec call
  * itself is stubbed (this container ships no image/audio libraries). The stub is
  * deterministic (derived from payload bytes) so tests are stable; swapping in a
  * real decoder means replacing ONE function body and nothing else.
  *
  * Scale notes: payloads never pass through a shuffle here — decode/feature
  * extraction runs `mapPartitions`-style next to the scan (narrow), and anything
  * aggregated downstream should project metadata/features first and drop the
  * bytes. Batch sizing comes from parquet row groups via
  * `spark.sql.files.maxPartitionBytes`, the same lever a real media pipeline uses.
  */
object Multimodal {

  /** Typed media metadata carried beside the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, nBytes: Long)

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, n_bytes: Long, feature: Array[Float])

  /** STUB — deterministic fake decode standing in for a real codec
    * (e.g. JPEG decode / audio resample). Dimensions and the "feature vector"
    * are pure functions of the payload bytes. Replace this body (and only
    * this body) with the real library call in a full deployment. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(kind = "fake", width = 64 + (n % 577), height = 64 + (n % 433), nBytes = n.toLong)
  }

  /** Deterministic fake feature extraction: a tiny byte histogram (8 buckets),
    * L1-normalized — the shape a real embedding/feature UDF would produce. */
  def featureStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val counts = new Array[Float](dims)
    payload.foreach(b => counts((b & 0xff) % dims) += 1f)
    val total = math.max(counts.sum, 1f)
    counts.map(_ / total)
  }

  /** Batch decode: the Scala analogue of `mapInPandas` — per-partition iterator
    * transform, zero driver involvement, preserves partitioning. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = decodeStub(r.payload)
        DecodedRow(r.media_id, r.kind, m.width, m.height, m.nBytes,
          featureStub(r.payload))
      }
    }
  }

  /** STUB resize — stands in for a real image resample. Deterministic:
    * nearest-neighbor byte subsampling of the payload to `targetW*targetH`
    * bytes; metadata updated to the target dims. Replace the byte math with a
    * real scaler without touching the Spark plumbing. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val n = targetW * targetH
    if (payload.isEmpty) new Array[Byte](0)
    else Array.tabulate(n)(i => payload((i.toLong * payload.length / n).toInt))
  }

  /** Batch resize: same per-partition narrow shape as [[decode]]. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(payload = resizeStub(r.payload, targetW, targetH))))
  }

  /** Frame sampling for video-like payloads: split the byte stream into
    * `frameSize` chunks, keep every `stride`-th — the row-explosion pattern a
    * real frame sampler produces (one row in → many rows out, still narrow). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int):
      DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (chunk, i) => (r.media_id, i, chunk.length, featureStub(chunk)) }
    }.toDF("media_id", "frame_idx", "frame_bytes", "feature")
  }

  /** STUB batch encoder — stands in for a model-server / GPU call that
    * consumes a whole batch at once. Deterministic and batch-size-invariant
    * by construction (pure per-row math); a real encoder must also be
    * row-wise deterministic or downstream hashes stop being reproducible. */
  def batchEncodeStub(batch: Seq[MediaRow], dims: Int): Seq[(Long, Array[Float])] =
    batch.map(r => r.media_id -> featureStub(r.payload, dims))

  /** Batched embedding: the model-inference shape — the partition iterator is
    * regrouped into fixed-size batches (what a GPU / inference server wants:
    * enough rows to fill the device, few enough to bound memory), the batch
    * call runs once per group, results flatten back to rows. `grouped` keeps
    * the iterator lazy: only `batchSize` payloads are resident per task at a
    * time, so batch size bounds task memory independently of partition size.
    * Same contract as `mapInPandas` with a batched model call in the lambda. */
  def embedBatched(media: Dataset[MediaRow], batchSize: Int = 64,
      dims: Int = 8): DataFrame = {
    require(batchSize >= 1, "batchSize >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => batchEncodeStub(batch, dims))
    }.toDF("media_id", "embedding")
  }

  /** Build a media table from the `documents` fixture (text bytes as payload) —
    * exercises the binary-column path end-to-end on shipped testdata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
