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

  // ── HyperLogLog ─────────────────────────────────────────────────────

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
    * fixed-memory answer to "how many distinct URLs/tokens/users in
    * 100 TB": 2^p one-byte registers (p=12 → 4 KB) per partition,
    * merged by element-wise MAX — commutative and idempotent, so the
    * estimate is independent of partitioning AND of re-processing the
    * same element twice (unlike CMS counts). Standard error
    * ≈ 1.04/√(2^p) (~1.6% at p=12); linear counting below 2.5·m fixes
    * the small-cardinality regime. Inputs are 64-bit hashes (callers
    * hash with `xxhash64` — deterministic across runs), so one sketch
    * type serves strings, longs, and composites.
    */
  final case class Hll(p: Int, registers: Array[Byte]) {
    require(p >= 4 && p <= 18, s"p out of range: $p")
    def m: Int = 1 << p
    def add(hash: Long): Unit = {
      val idx = (hash >>> (64 - p)).toInt
      val w = hash << p
      // rank of the first set bit in the remaining 64-p bits, 1-based;
      // all-zero tail → maximum rank (64 - p + 1)
      val rank = (if (w == 0L) 64 - p + 1
                  else math.min(java.lang.Long.numberOfLeadingZeros(w) + 1,
                    64 - p + 1)).toByte
      if (rank > registers(idx)) registers(idx) = rank
    }
    def merge(other: Hll): Hll = {
      require(other.p == p, "cannot merge sketches of different precision")
      var i = 0
      while (i < registers.length) {
        if (other.registers(i) > registers(i))
          registers(i) = other.registers(i)
        i += 1
      }
      this
    }
    def estimate: Long = {
      // per-m bias constants below m=128 (Flajolet et al. Fig. 6);
      // the asymptotic formula is only valid from m ≥ 128
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.pow(2.0, -registers(i).toDouble)
        if (registers(i) == 0) zeros += 1
        i += 1
      }
      val e = alpha * m.toDouble * m.toDouble / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.round(corrected)
    }
  }

  final class HllAggregator(p: Int) extends Aggregator[Long, Hll, Hll] {
    override def zero: Hll = Hll(p, new Array[Byte](1 << p))
    override def reduce(buf: Hll, hash: Long): Hll = { buf.add(hash); buf }
    override def merge(a: Hll, b: Hll): Hll = a.merge(b)
    override def finish(buf: Hll): Hll = buf
    override def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    override def outputEncoder: Encoder[Hll] = Encoders.kryo[Hll]
  }

  /** Approximate distinct count of a column (one pass, 2^p bytes per
    * partition on the wire).
    */
  def distinctCount(df: DataFrame, colName: String, p: Int = 12)
                   (implicit spark: SparkSession): Long = {
    import spark.implicits._
    // null filter BEFORE hashing: xxhash64(NULL) = the seed, never
    // null, so a post-hash na.drop would count nulls as one extra
    // distinct element
    df.filter(col(colName).isNotNull)
      .select(xxhash64(col(colName)).as("h")).as[Long]
      .select(new HllAggregator(p).toColumn).head().estimate
  }

  /** `(group, est_distinct)` — per-group approximate distinct counts;
    * the shuffle carries one 2^p-byte sketch per (group × partition),
    * never the values.
    */
  /** Null contract: rows with a null VALUE are excluded (a null is not
    * a distinct element), and rows with a null GROUP are excluded (the
    * typed key path has no null-group bucket) — both filtered before
    * hashing, since `xxhash64(NULL)` yields the seed, not null.
    *
    * Output type contract: the group column comes back as STRING
    * regardless of its input type (the typed aggregation path needs a
    * concrete key encoder). A caller joining the estimates back to the
    * source must cast its own key — or this result's — to match.
    */
  def distinctPerGroup(df: DataFrame, groupCol: String, colName: String,
                       p: Int = 12)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val agg = new HllAggregator(p)
    df.filter(col(colName).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        xxhash64(col(colName)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .map { case (g, hll) => (g, hll.estimate) }
      .toDF(groupCol, "est_distinct")
  }

  /** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) — the
    * sketch family's one EXACTLY-replayable member. HLL's estimate is
    * a register-layout artifact no second engine reproduces (q_t_hll
    * therefore oracles the exact count plus the machine-checked error
    * ENVELOPE rather than the estimate value — round-16); KMV's
    * estimate is a pure
    * integer function of the k smallest 48-bit hash values of the
    * distinct elements, and the hash is md5 — which every SQL engine
    * computes bit-identically. A DuckDB oracle therefore replays the
    * whole estimate: rank the distinct md5-derived hashes, take the
    * k-th smallest h_k, emit (k−1)·2⁴⁸ `div` h_k. Same fixed-memory
    * execution shape as CMS/HLL: per-partition bounded buffer (≤ k
    * longs), map-side partial aggregation, merge = keep the k smallest
    * of the union — only k·8 bytes per (group × partition) cross the
    * wire, never the token stream.
    *
    * Estimator contract: while UNSATURATED (fewer than k distinct
    * hashes seen) the sketch holds the entire distinct hash set and
    * the count is exact; once saturated, (k−1)·M/h_k with
    * M = 2⁴⁸ and integer division (exact in int64 for k ≤ 32767:
    * (k−1)·2⁴⁸ < 2⁶³). 48-bit hashes keep the estimate within int64
    * on BOTH engines; hash collisions at 2⁴⁸ are ~n²/2⁴⁹ — irrelevant
    * for the estimator's own ±1/√(k−2) error, and harmless to the
    * oracle either way because both sides rank the same hash values.
    */
  /** Buffer layout: `arr(0 until n)` is the sorted ascending set of
    * kept hashes, `n ≤ k` — a flat primitive array (the CMS buffer
    * discipline: kryo round-trips an `Array[Long]` bit-exactly, where
    * a comparator-carrying tree collection does not survive partial-
    * aggregation serialization intact). Post-saturation adds cost one
    * comparison against `arr(k−1)` in the common reject case.
    */
  final case class Kmv(k: Int, var n: Int, arr: Array[Long]) {
    def add(h: Long): Unit = {
      if (n >= k && h >= arr(k - 1)) return
      val pos = java.util.Arrays.binarySearch(arr, 0, n, h)
      if (pos >= 0) return // set semantics: already kept
      val ins = -pos - 1
      if (n < k) {
        System.arraycopy(arr, ins, arr, ins + 1, n - ins)
        arr(ins) = h
        n += 1
      } else {
        System.arraycopy(arr, ins, arr, ins + 1, k - ins - 1)
        arr(ins) = h
      }
    }
    def merge(other: Kmv): Kmv = {
      var i = 0
      while (i < other.n) { add(other.arr(i)); i += 1 }
      this
    }
    def saturated: Boolean = n >= k
    /** Exact while unsaturated; (k−1)·2⁴⁸ div h_k once saturated. */
    def estimate: Long =
      if (!saturated) n.toLong
      else ((k - 1).toLong * Kmv.HashSpace) / arr(k - 1)
  }
  object Kmv {
    /** 2⁴⁸ — the hash range (12 md5 hex digits). */
    val HashSpace: Long = 1L << 48
    def empty(k: Int): Kmv = Kmv(k, 0, new Array[Long](k))
  }

  final class KmvAggregator(k: Int) extends Aggregator[Long, Kmv, Kmv] {
    override def zero: Kmv = Kmv.empty(k)
    override def reduce(buf: Kmv, h: Long): Kmv = { buf.add(h); buf }
    override def merge(a: Kmv, b: Kmv): Kmv = a.merge(b)
    override def finish(buf: Kmv): Kmv = buf
    override def bufferEncoder: Encoder[Kmv] = Encoders.kryo[Kmv]
    override def outputEncoder: Encoder[Kmv] = Encoders.kryo[Kmv]
  }

  /** The engine-portable 48-bit hash: first 12 md5 hex digits as an
    * integer. `conv` here ≡ the hex-digit polynomial a SQL oracle
    * spells out — both are the same big-endian base-16 read.
    */
  def hash48(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-group KMV sketches as a bounded driver map (groups × k
    * longs — a sketch is a bounded driver object by design, the CMS
    * precedent). The raw-sketch form exists for FOLDING: merge these
    * across feeds/micro-batches/days and the result is bit-identical
    * to the one-shot sketch of the concatenation (merge is
    * commutative, associative, idempotent — PropertySpec).
    */
  def kmvPerGroup(df: DataFrame, groupCol: String, colName: String,
                  k: Int = 1024)
                 (implicit spark: SparkSession): Map[String, Kmv] = {
    import spark.implicits._
    val agg = new KmvAggregator(k)
    df.filter(col(colName).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(colName)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .collect().toMap
  }

  /** `(group, est_distinct, sketch_rows)` — per-group KMV distinct
    * estimates. Null contract and STRING-group output type identical
    * to [[distinctPerGroup]]; `sketch_rows` = min(distinct, k) is the
    * buffer occupancy (k ⇒ saturated, estimate path; < k ⇒ exact
    * path).
    */
  def kmvDistinctPerGroup(df: DataFrame, groupCol: String, colName: String,
                          k: Int = 1024)
                         (implicit spark: SparkSession): DataFrame = {
    require(k >= 2 && k <= 32767,
      s"k must be in [2, 32767] for exact int64 arithmetic, got $k")
    import spark.implicits._
    val agg = new KmvAggregator(k)
    df.filter(col(colName).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(colName)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .map { case (g, kmv) => (g, kmv.estimate, kmv.n.toLong) }
      .toDF(groupCol, "est_distinct", "sketch_rows")
  }
}
