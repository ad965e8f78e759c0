package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter sketch over 64-bit keys, built as a distributed
  * aggregation and consumed as a broadcast scan-side prefilter.
  *
  * The 100 TB role: a semi-join against a SMALL key set (benchmark
  * shingles for decontamination, a blocklist, a dictionary) normally
  * shuffles the ENTIRE big side on the probe key. With a Bloom sketch
  * of the small side broadcast to every task, the big side is filtered
  * at the scan — before any exchange — and only the ~fpp fraction of
  * false-positive rows (plus the true hits) ever reach the exact join
  * that removes false positives. No false negatives, so composing
  * `prefilter → exact verify` is EXACTLY the semi-join relation; the
  * sketch only changes how much data moves. This is the same play
  * Spark's own runtime row-level filtering makes, exposed here as a
  * first-class, deterministic operator the pipeline can aim anywhere.
  *
  * Determinism: bit layout depends only on (numBits, numHashes) and
  * the key values — splitmix64 double hashing, no per-session salt —
  * so a sketch is reproducible and safely persistable.
  *
  * Scale accounting: the ONLY driver round-trip is the finished bit
  * array (m/8 bytes — ~1.2 MB per million keys at 1% fpp), returned by
  * one executor-side OR-merge aggregation; raw keys never leave the
  * executors. Tasks read the bits through a torrent broadcast, never a
  * task-closure copy.
  */
object Bloom {

  /** Finished sketch: `numBits = bits.length * 64`. */
  final case class Sketch(bits: Array[Long], numHashes: Int) {
    def numBits: Long = bits.length.toLong * 64L
    def sizeBytes: Long = bits.length.toLong * 8L
    def mightContain(x: Long): Boolean =
      Bloom.test(bits, numHashes, x)
  }

  /** Textbook sizing: m = −n·ln p / (ln 2)², floor 64 bits. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1); got $expectedItems, $fpp")
    val m = math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    math.max(64L, m)
  }

  /** k = m/n · ln 2, clamped to [1, 16]. */
  def optimalNumHashes(expectedItems: Long, numBits: Long): Int =
    math.min(16, math.max(1,
      math.round(numBits.toDouble / expectedItems * math.log(2)).toInt))

  // splitmix64 finalizer — full-avalanche mix of the raw key (shingle
  // hashes arrive mod 1e9+7, far from uniform over 64 bits)
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Kirsch–Mitzenmacher double hashing: bit_i = (h1 + i·h2) mod m. */
  private[operators] def insert(bits: Array[Long], numHashes: Int,
                                x: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix(x)
    val h2 = mix(x ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      bits((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  private[operators] def test(bits: Array[Long], numHashes: Int,
                              x: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix(x)
    val h2 = mix(x ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Executor-side build: each partition folds its keys into one local
    * bit array (the map-side partial), partials merge by bitwise OR,
    * and the driver receives exactly one finished array.
    */
  private final class BloomAgg(numWords: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numWords)
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      insert(b, numHashes, x); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoderShim.arrayLong
  }

  /** Build a sketch from a single LONG column in one aggregation job. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long,
            fpp: Double = 0.01): Sketch = {
    val m = optimalNumBits(expectedItems, fpp)
    // a single JVM array bounds the sketch at ~16 GiB; checking m
    // itself (not (m+63)/64, whose +63 can overflow when
    // optimalNumBits saturates) guarantees the word count fits and
    // the failure is a clear driver-side error, never a negative
    // executor allocation
    require(m <= Int.MaxValue.toLong * 64L,
      s"sketch too large: $expectedItems items at fpp=$fpp needs $m bits" +
        " — raise fpp or partition the key space")
    val words = ((m + 63L) / 64L).toInt
    val k = optimalNumHashes(expectedItems, words.toLong * 64L)
    import df.sparkSession.implicits._
    val agg = new BloomAgg(words, k)
    val bits = df.select(col(keyCol).cast("long")).na.drop()
      .as[Long].select(agg.toColumn).head()
    Sketch(bits, k)
  }

  /** Membership test expression. The bit array travels as a BROADCAST
    * (one torrent transfer per executor), not inside the serialized
    * task — the difference between shipping megabytes once and
    * shipping them with every task at 100k tasks/stage.
    */
  private[graft] case class MightContain(child: Expression,
                                         bc: Broadcast[Sketch])
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = BooleanType
    override def nullSafeEval(input: Any): Any =
      bc.value.mightContain(input.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): MightContain =
      copy(child = c)
  }

  /** Broadcast a sketch once for reuse across many membership tests.
    * The caller owns the lifecycle: `destroy()` it when the last plan
    * using it has executed — repeated [[mightContain]] convenience
    * calls each create a fresh broadcast that lingers until the
    * ContextCleaner notices, which in a long session is an
    * accumulation, not a leak the GC rushes to fix.
    */
  def broadcastSketch(spark: SparkSession,
                      sketch: Sketch): Broadcast[Sketch] =
    spark.sparkContext.broadcast(sketch)

  /** `true` iff `c` might be in the sketch (false ⇒ definitely not),
    * against a caller-managed broadcast ([[broadcastSketch]]).
    */
  def mightContain(c: Column, bc: Broadcast[Sketch]): Column =
    ColumnBridge.column(MightContain(ColumnBridge.expression(c), bc))

  /** Convenience form: broadcasts per call — fine for one-shot plans;
    * hot/repeated callers should hold a [[broadcastSketch]] handle.
    */
  def mightContain(spark: SparkSession, c: Column, sketch: Sketch): Column =
    mightContain(c, broadcastSketch(spark, sketch))
}

/** `Encoders.kryo` can't be an OUTPUT encoder for `.head()` reads in a
  * select-typed-column plan on every Spark minor, while the reflective
  * `ExpressionEncoder()` handles `Array[Long]` natively — factored out
  * so the aggregator body stays readable.
  */
private object ExpressionEncoderShim {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayLong: Encoder[Array[Long]] = ExpressionEncoder()
}
