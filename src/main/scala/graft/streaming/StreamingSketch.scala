package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{NativeExpressions, TextFunctions}
import graft.operators.Sketch

/** Sketches folded across a stream — the "distinct users this month
  * without rescanning the month" shape: each micro-batch contributes
  * its bounded per-group sketches, and a driver-held accumulator
  * merges them. The KMV merge is commutative, associative and
  * IDEMPOTENT (PropertySpec), which is exactly the algebra a
  * foreachBatch fold needs: a batch replayed after a restart merges
  * the same sketch again and changes nothing, so the accumulated
  * result equals the one-shot batch sketch of the whole feed —
  * bit-identically, not approximately. That identity is why the
  * streaming gate shares the batch gate's DuckDB oracle.
  *
  * State is groups × k longs on the driver (a sketch is a bounded
  * driver object by design — the CMS contract); the heavy work (token
  * explode, hashing, partial aggregation) stays distributed inside
  * each micro-batch.
  */
object StreamingSketch {

  /** Per-language distinct-token KMV estimates over a documents feed,
    * folded micro-batch by micro-batch (maxFilesPerTrigger=1, one
    * AvailableNow run). Returns `(lang, est_distinct, sketch_rows)` —
    * the same surface as the batch `Sketch.kmvDistinctPerGroup` over
    * the concatenated feed.
    */
  def kmvDistinctTokensStream(spark: SparkSession, feedDir: String,
                              checkpoint: String,
                              k: Int = 16): DataFrame = {
    import spark.implicits._
    val acc = scala.collection.mutable.Map.empty[String, Sketch.Kmv]
    val schema = spark.read.parquet(feedDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // lang staged BEFORE the explode (the per-OUTPUT-row
        // generator-projection lesson) — identical derivation to the
        // batch gate, so fold(batches) ≡ batch(whole feed)
        val d = batch
          .select(NativeExpressions.textProfile(coalesce(col("text"),
              lit(""))).getField("lang_pred").as("lang"),
            TextFunctions.tokens(coalesce(col("text"), lit("")))
              .as("__t"))
          .select(col("lang"), explode(col("__t")).as("token"))
        Sketch.kmvPerGroup(d, "lang", "token", k)(batch.sparkSession)
          .foreach { case (g, s) =>
            acc.get(g) match {
              case Some(cur) => cur.merge(s); ()
              case None => acc(g) = s
            }
          }
        ()
      }
      .start()
    q.awaitTermination()
    acc.toSeq
      .map { case (g, s) => (g, s.estimate, s.n.toLong) }
      .toDF("lang", "est_distinct", "sketch_rows")
  }

  /** Count–min sketch folded across the feed's micro-batches. The
    * instructive CONTRAST with the KMV fold above: CMS merge is
    * element-wise ADDITION — exact for a concatenation of disjoint
    * batches (fold ≡ one-shot, SketchSpec), but NOT idempotent: a
    * replayed batch double-counts. The KMV fold is replay-safe by
    * algebra; the CMS fold instead leans on the checkpoint's
    * batch-skip (a completed batch id is never re-offered to
    * foreachBatch on AvailableNow resume) — i.e. additive sketches
    * need the harness's effectively-once, min-style sketches don't.
    */
  def cmsTokensStream(spark: SparkSession, feedDir: String,
                      checkpoint: String, depth: Int = 4,
                      width: Int = 1 << 12): Sketch.Cms = {
    var acc: Sketch.Cms = null
    val schema = spark.read.parquet(feedDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val c = Sketch.sketchTokens(batch, "text", depth,
          width)(batch.sparkSession)
        acc = if (acc == null) c else acc.merge(c)
        ()
      }
      .start()
    q.awaitTermination()
    require(acc != null, "empty feed — no batches arrived")
    acc
  }
}
