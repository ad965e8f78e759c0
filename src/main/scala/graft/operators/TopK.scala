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

  /** Bounded binary min-heap ordered worst-first: the k-th best pair
    * sits at the root, so rejecting a row is one comparison and
    * accepting one is O(log k) — the previous sorted-`List` buffer
    * re-sorted on every accepted row (O(k log k) per row, noticeable
    * from k≈100). Mutable by design: Spark keeps the buffer object
    * live between `reduce` calls and kryo-serializes it only across
    * partition boundaries.
    */
  final case class TopKBuf(scores: Array[Double], ids: Array[Long],
                           var n: Int) {
    // a is strictly worse than b: lower score, tie-break larger id
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def swap(i: Int, j: Int): Unit = {
      val s = scores(i); scores(i) = scores(j); scores(j) = s
      val d = ids(i); ids(i) = ids(j); ids(j) = d
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // index of the worst of (i, l, r)
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

    def insert(score: Double, id: Long): Unit = {
      val k = scores.length
      if (n < k) {
        scores(n) = score; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
        scores(0) = score; ids(0) = id; siftDown()
      }
    }

    /** Best-first (score desc, id asc) — the output order. */
    def sortedPairs: Seq[Pair] =
      (0 until n).map(i => (scores(i), ids(i)))
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }

  /** IN = (id, score); key grouping happens outside (any key type —
    * the buffer never sees it).
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Double), TopKBuf, Seq[Pair]] {
    override def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)
    override def reduce(buf: TopKBuf, r: (Long, Double)): TopKBuf = {
      buf.insert(r._2, r._1); buf
    }
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var i = 0
      while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
      a
    }
    override def finish(buf: TopKBuf): Seq[Pair] = buf.sortedPairs
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
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
    // null scores (a zero-norm vector's cosine), ids, or keys would
    // crash the primitive-tuple encoder — an unrankable row is skipped,
    // like the window form's NULLS LAST beyond rank k
    val ds = scored.select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .na.drop()
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn)
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((score, id), i) =>
          (key, i + 1, id, round6HalfUp(score))
        }
      }
      .toDF(keyCol, "rank", idCol, scoreCol)
  }

  /** Per-group top-N with a STRING group key — the quota-sampling /
    * per-group-cap shape of corpus curation (top docs per language,
    * per domain, per source). Same bounded buffer, same
    * no-global-sort property; only the grouping key type differs.
    */
  def topKPerGroup(scored: DataFrame, k: Int,
                   keyCol: String, idCol: String, scoreCol: String)
                  (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val agg = new TopKAggregator(k)
    val ds = scored.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .na.drop() // see topKPerKey
      .as[(String, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn)
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((score, id), i) =>
          (key, i + 1, id, round6HalfUp(score))
        }
      }
      .toDF(keyCol, "rank", idCol, scoreCol)
  }
}
