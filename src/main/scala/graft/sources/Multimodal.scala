package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6): media payloads travel as
  * opaque binary columns with typed metadata alongside. The decode /
  * feature-extraction step runs per partition so a real implementation
  * can batch-initialize a codec once per partition (the image/audio
  * libraries are not available in this container, so [[decodeStub]] is a
  * deterministic fake — the Spark-side plumbing (schema, typed Dataset,
  * partition-wise execution, batch shape) is real and oracle-tested).
  */
object Multimodal {

  /** A media row as it would arrive from ingestion. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Typed features extracted per payload. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      first_byte: Int,
      fake_width: Int,
      fake_height: Int,
      fake_frames: Int)

  /** STUB: a real build decodes `content` with an image/audio codec here
    * (e.g. JPEG dimensions, PCM duration). This fake derives the same
    * shape of metadata deterministically from the bytes so the pipeline
    * and its oracle are testable without codecs.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.content.length
    val first = if (n > 0) r.content(0) & 0xff else 0
    MediaFeatures(r.doc_id, n, first,
      fake_width = n % 64 + 1,
      fake_height = first % 64 + 1,
      fake_frames = n % 10 + 1)
  }

  /** text → binary payload ingestion + partition-wise decode. At scale
    * the input partitioning carries through: no shuffle, one codec init
    * per partition.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** One sampled video frame's features. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_hash: Int,
                            n_frames: Int)

  /** Frame sampling over "video" payloads: every `step`-th frame of each
    * payload becomes a row (the 1→N shape of real frame extraction).
    * Decoding runs in fixed-size batches inside each partition — the
    * shape a real codec wants (amortized init, bounded batch memory);
    * the per-frame feature is a deterministic stub (codecs unavailable
    * here) so the fan-out is oracle-checkable in SQL.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   step: Int = 2, batchSize: Int = 64): Dataset[FrameRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would go here
        batch.iterator.flatMap { r =>
          val f = decodeStub(r)
          (0 until f.fake_frames by step).map { idx =>
            FrameRow(r.doc_id, idx, (f.first_byte * 31 + idx * 17) % 997,
              f.fake_frames)
          }
        }
      })
  }

  /** One decoded chunk of a binary payload. */
  final case class ChunkRow(doc_id: Long, chunk_idx: Int, offset: Int,
                            n_chunk_bytes: Int, chunk_hash: Long, n_chunks: Int)

  /** Chunked binary decode: each payload splits into fixed-size byte
    * chunks (the audio-window / image-tile shape), processed in bounded
    * batches per partition — the mapInPandas batch contract expressed in
    * Scala: a real codec initializes once per batch, sees `batchSize`
    * payloads of ≤ `chunkBytes` chunks, and memory stays bounded by
    * batch × chunk, never by payload count. The per-chunk feature is a
    * rolling polynomial hash over the chunk's bytes — deterministic and
    * SQL-replayable, so the whole 1→N fan-out is oracle-checked.
    */
  def chunkDecode(spark: SparkSession, docs: DataFrame,
                  chunkBytes: Int = 32, batchSize: Int = 64): Dataset[ChunkRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("content"))
      .as[MediaRow]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        // per-batch codec/buffer init would go here (amortized across
        // the batch, bounded memory regardless of partition size)
        batch.iterator.flatMap { r =>
          val n = r.content.length
          val nChunks = math.max(1, (n + chunkBytes - 1) / chunkBytes)
          (0 until nChunks).map { ci =>
            val off = ci * chunkBytes
            val len = math.max(0, math.min(chunkBytes, n - off))
            var h = 0L
            var i = 0
            while (i < len) { h = (h * 31 + (r.content(off + i) & 0xff)) % 1000000007L; i += 1 }
            ChunkRow(r.doc_id, ci, off, len, h, nChunks)
          }
        }
      })
  }
}
