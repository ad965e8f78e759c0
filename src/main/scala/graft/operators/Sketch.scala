package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Count–min sketch over a token stream — the fixed-memory frequency
  * estimator for corpora whose exact vocabulary histogram would not
  * fit anywhere (the "how often does this phrase occur in 100 TB"
  * question answered with depth×width longs).
  *
  * Implemented as a typed `Aggregator`, the canonical distributed
  * sketch shape: every partition folds its tokens into a local d×w
  * counter matrix (the map-side partial), matrices merge by
  * element-wise addition (commutative + associative, so the plan is a
  * partial+final aggregation with NO shuffle of tokens — only
  * depth·width longs per partition cross the wire), and the finished
  * sketch is a bounded driver object by design.
  *
  * Standard CMS guarantees (Cormode–Muthukrishnan): estimates never
  * undercount; overcount ≤ 2N/width with probability 1 − 2^−depth
  * (SketchSpec pins both on a real corpus). Hashing is seeded
  * Murmur3 — deterministic across runs and partitionings.
  */
object Sketch {

  final case class Cms(depth: Int, width: Int, counters: Array[Long]) {
    private[operators] def bucket(d: Int, token: String): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(token, 0x9747b28c + d)
      math.floorMod(h, width)
    }
    def add(token: String, n: Long = 1L): Unit = {
      var d = 0
      while (d < depth) {
        counters(d * width + bucket(d, token)) += n
        d += 1
      }
    }
    def estimate(token: String): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = counters(d * width + bucket(d, token))
        if (c < best) best = c
        d += 1
      }
      best
    }
    def merge(other: Cms): Cms = {
      require(other.depth == depth && other.width == width,
        "cannot merge sketches of different shapes")
      var i = 0
      while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
      this
    }
    /** Total stream length (any row's sum — row 0). */
    def totalCount: Long = {
      var s = 0L
      var i = 0
      while (i < width) { s += counters(i); i += 1 }
      s
    }
  }

  final class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[String, Cms, Cms] {
    override def zero: Cms = Cms(depth, width, new Array[Long](depth * width))
    override def reduce(buf: Cms, token: String): Cms = { buf.add(token); buf }
    override def merge(a: Cms, b: Cms): Cms = a.merge(b)
    override def finish(buf: Cms): Cms = buf
    override def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    override def outputEncoder: Encoder[Cms] = Encoders.kryo[Cms]
  }

  /** Sketch the tokens of a text column in one pass. */
  def sketchTokens(docs: DataFrame, textCol: String,
                   depth: Int = 4, width: Int = 1 << 14)
                  (implicit spark: SparkSession): Cms = {
    import spark.implicits._
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .as[String]
      .select(new CmsAggregator(depth, width).toColumn)
      .head()
  }

  /** (token, est_count) for a bounded list of probe tokens — the
    * driver-side read path of the sketch (≤ |probes| estimates, each
    * O(depth)). CONTRACT: `probes` must be a bounded, caller-chosen
    * list (a top-N from an aggregate, a watchlist, a sample) — never
    * the corpus's full distinct vocabulary, which on an open web corpus
    * is billions of tokens and would turn this driver-side convenience
    * into an unbounded collect. The sketch exists precisely so that
    * per-token reads stay O(depth) without a vocabulary table.
    */
  def estimateAll(spark: SparkSession, cms: Cms,
                  probes: Seq[String]): DataFrame = {
    import spark.implicits._
    probes.map(t => (t, cms.estimate(t))).toDF("token", "est_count")
  }
}
