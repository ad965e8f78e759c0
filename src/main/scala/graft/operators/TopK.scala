package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-key top-k as a typed `Aggregator` — the scale-path
  * alternative to `row_number().over(Window)`.
  *
  * The window form materializes and SORTS every scored row inside each
  * key partition before discarding all but k. This aggregator keeps a
  * bounded buffer of k (score, id) pairs per key per partition (the
  * map-side partial), merges buffers in the reduce — so the shuffle
  * carries at most k pairs per (key × partition) instead of the full
  * score matrix, and nothing is ever globally sorted. For ANN search
  * at |corpus|×|queries| scale, that is the difference between
  * shuffling billions of scores and shuffling k·|queries|·partitions.
  *
  * Deterministic tie-break: higher score first, then smaller id.
  */
object TopK {

  type Pair = (Double, Long) // (score, id)

  /** IN = (key, id, score); key grouping happens outside. */
  final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long, Double), List[Pair], Seq[Pair]] {
    private def lt(a: Pair, b: Pair): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: List[Pair] = Nil
    override def reduce(buf: List[Pair], r: (Long, Long, Double)): List[Pair] = {
      val p = (r._3, r._2)
      if (buf.length >= k && lt(buf.last, p)) buf
      else ((p :: buf).sortWith(lt)).take(k)
    }
    override def merge(a: List[Pair], b: List[Pair]): List[Pair] =
      (a ++ b).sortWith(lt).take(k)
    override def finish(buf: List[Pair]): Seq[Pair] = buf.sortWith(lt)
    override def bufferEncoder: Encoder[List[Pair]] =
      Encoders.kryo[List[Pair]]
    override def outputEncoder: Encoder[Seq[Pair]] = Encoders.kryo[Seq[Pair]]
  }

  private def round6HalfUp(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-query top-k over a scored pair table (q_id, n_id, score)
    * using the bounded aggregator; output shape and rounding match the
    * window path exactly: (q_id, rank, n_id, round(score, 6)).
    */
  def topKPerKey(scored: DataFrame, k: Int,
                 keyCol: String = "q_id", idCol: String = "n_id",
                 scoreCol: String = "cosine")
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val agg = new TopKAggregator(k)
    val ds = scored.select(col(keyCol).cast("long"), col(idCol).cast("long"),
      col(scoreCol).cast("double")).as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .agg(agg.toColumn)
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((score, id), i) =>
          (key, i + 1, id, round6HalfUp(score))
        }
      }
      .toDF(keyCol, "rank", idCol, scoreCol)
  }
}
