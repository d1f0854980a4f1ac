package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The DECODE step is a clearly-marked STUB (this container has no
  * image/audio codecs): it derives deterministic fake dimensions from the
  * byte stream. Everything AROUND the stub — the schema, the Dataset
  * batch shape, the per-partition iteration, the metadata struct — is the
  * real plumbing a codec drop-in would use. At scale the binary column
  * stays columnar in parquet, the decode map is narrow (no shuffle), and
  * feature outputs are small typed columns.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, bytes: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int,
                             height: Int, channels: Int)

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for a real media blob). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))

  /** STUB decoder: a real implementation would parse the container format
    * here (JPEG/PNG/WAV...). The fake is a pure function of the payload so
    * every engine agrees on the output. */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.bytes.length.toLong
    MediaMeta(b.doc_id, n, (n % 256).toInt + 1, ((n * 7) % 256).toInt + 1, 3)
  }

  /** Batch decode over partitions: the Dataset[MediaBlob] → Dataset
    * [MediaMeta] shape (and its per-partition iterator) is exactly what a
    * codec UDF would plug into. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withBlob(docs).as[MediaBlob].mapPartitions(_.map(decodeStub))
  }

  /** Deterministic frame sampling stub: pick every k-th "frame" offset of
    * the payload (a video decoder would emit real frames). */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyK: Int = 64): DataFrame = {
    import spark.implicits._
    withBlob(docs).as[MediaBlob].flatMap { b =>
      b.bytes.indices.by(everyK).map(off =>
        (b.doc_id, off.toLong, (b.bytes(off) & 0xff).toLong))
    }.toDF("doc_id", "frame_off", "frame_val")
  }
}
