package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise in batches.
  *
  * The Spark-side mechanics are real and tested — schema contract,
  * partition-wise batched iteration (the JVM shape of what
  * `mapInPandas` does in Python: amortize per-batch setup over
  * `batchSize` rows), partitioning control — while the actual codec
  * calls are STUBBED with a deterministic fake (`???`-equivalent):
  * image/audio libraries are not in this container. Swapping
  * `StubCodec` for a real decoder (JavaCV, TwelveMonkeys, ffmpeg JNI)
  * changes no Spark plumbing.
  *
  * Scale notes:
  *  - decode is embarrassingly parallel; the operator neither shuffles
  *    nor collects. Input partitioning is preserved; use
  *    `repartition(n)` upstream to size decode tasks so one batch of
  *    decoded frames fits executor memory;
  *  - binary payloads never pass through a Python/Arrow boundary here —
  *    mapPartitions over the typed Dataset keeps them as byte arrays in
  *    the JVM.
  */
object Multimodal {

  /** One media row: id + raw bytes + declared format. */
  final case class MediaRow(media_id: Long, content: Array[Byte],
                            format: String)

  /** Decoded metadata — what a real codec would surface. */
  final case class DecodedMedia(media_id: Long, byte_len: Int,
                                width: Int, height: Int,
                                n_frames: Int, format: String)

  /** STUB codec — deterministic fake standing in for a real
    * image/audio decoder (not available in this container). Derives
    * "dimensions" from the first bytes so tests and oracles are
    * reproducible: width = byte[0], height = byte[1] (unsigned),
    * n_frames = len / 64 + 1.
    */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val w = if (bytes.length > 0) bytes(0) & 0xFF else 0
      val h = if (bytes.length > 1) bytes(1) & 0xFF else 0
      val frames = bytes.length / 64 + 1
      (w, h, frames)
    }
    /** Fake resize: new dims, content untouched (a real impl returns
      * re-encoded bytes).
      */
    def resize(d: DecodedMedia, w: Int, h: Int): DecodedMedia =
      d.copy(width = w, height = h)
  }

  /** Partition-wise batched decode. `batchSize` mirrors
    * `spark.sql.execution.arrow.maxRecordsPerBatch` semantics: the
    * codec is handed groups of rows so per-batch init (model load,
    * codec context) amortizes — the exact contract a Pandas-UDF batch
    * has, expressed JVM-native.
    */
  def decodeBatched(media: Dataset[MediaRow], batchSize: Int = 256)
                   (implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (codec context etc.)
        batch.iterator.map { row =>
          val (w, h, f) = StubCodec.decode(row.content)
          DecodedMedia(row.media_id, row.content.length, w, h, f, row.format)
        }
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th frame index of a
    * decoded video — pure column math, no codec needed for the index
    * plan (the fetch of actual frame bytes is the stubbed part).
    */
  def sampleFrameIndexes(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  /** Demo wiring over the `documents` table: treat UTF-8 bytes of
    * `text` as the opaque payload. Proves the end-to-end path
    * (binary column → typed Dataset → batched decode → DataFrame out)
    * against real testdata.
    */
  def decodeDocumentsAsMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // non-ASCII chars are multi-byte in UTF-8, which would make the
    // byte-level stub dims diverge from any character-level oracle —
    // sanitize so byte == character for the demo payload
    val media = docs
      .select(col("doc_id").as("media_id"),
        encode(regexp_replace(col("text"), "[^\\x00-\\x7F]", "?"), "UTF-8")
          .as("content"),
        lit("fake/rgb8").as("format"))
      .as[MediaRow]
    decodeBatched(media)(spark).toDF()
  }
}
