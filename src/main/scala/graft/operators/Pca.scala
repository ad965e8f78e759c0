package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding pipelines (the OPQ-style rotation +
  * variance-normalization step before ANN indexing, and the standard
  * embedding-whitening retrieval fix) — split Spark-first:
  *
  *  - the DATA-sized work (the d×d second-moment matrix) is ONE
  *    distributed aggregation over EXACT integer micros — each
  *    component is quantized `round(1e6·x)`, and a float×1e6 product
  *    is exact in double (24+20 mantissa bits < 53), so both engines
  *    round the IDENTICAL value; the rare exact-.5 landing (coarse
  *    mantissas like 23/128) breaks by the away-from-zero rule both
  *    engines share (PcaSpec pins it). The Gram is bit-reproducible
  *    across partitionings and replayable by the SQL oracle;
  *  - the MODEL-sized work (d×d eigensolve) runs on the driver over
  *    the collected triangle — d ≤ a few hundred for embedding
  *    columns, so this is microseconds and deterministic (cyclic
  *    Jacobi, fixed sweep order, sign-canonicalized eigenvectors).
  *
  * At 100 TB the Gram aggregation is a map-side-combined shuffle of
  * d(d+1)/2 running sums per partition — no row survives the map
  * side; int64 holds while n·(1e6·|x|)² < 2⁶³, i.e. ~10¹⁰ rows of
  * unit-scale embeddings — beyond that, quantize at 1e3 (PCA needs
  * ~3 significant digits, the eigensolve renormalizes anyway).
  */
object Pca {

  /** Trained model: `components(c)(j)` = weight of input dim j in
    * component c (rows orthonormal, eigenvalue-descending, sign fixed
    * so each row's largest-|weight| entry is positive); `eigenvalues`
    * the matching covariance eigenvalues; `means` per-dim means.
    */
  final case class Model(components: Array[Array[Double]],
                         eigenvalues: Array[Double],
                         means: Array[Double]) {
    def k: Int = components.length
    def dim: Int = means.length
  }

  /** Per-partition flat-triangle accumulator: each input row adds its
    * d(d+1)/2 products into ONE long[] buffer — no intermediate rows
    * at all (the struct-explode formulation this replaces churned
    * n·d²/2 rows through the hash aggregate; measured 2× on the
    * sf0.1 gate). Merge is element-wise addition, so the shuffle is
    * P buffers of d(d+1)/2 longs.
    */
  private final class GramAggregator(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Seq[Long]] {
    private val len = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
      require(q.length >= dim,
        s"vector of length ${q.length} shorter than dim $dim")
      val a = q.toArray
      var p = 0
      var i = 0
      while (i < dim) {
        val qi = a(i)
        var j = i
        while (j < dim) { buf(p) += qi * a(j); p += 1; j += 1 }
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var p = 0
      while (p < len) { x(p) += y(p); p += 1 }
      x
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact integer-micro Gram triangle: (i, j, g) for 1 ≤ i ≤ j ≤ dim,
    * `g = Σ_rows round(1e6·x_i)·round(1e6·x_j)` — the one data-sized
    * pass, engine-exact. A row with a shorter vector fails loudly
    * (the aggregator validates length; null vectors drop like any
    * null aggregate input).
    */
  def gramMicros(df: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    import df.sparkSession.implicits._
    val q = transform(vecCol,
      x => round(x.cast("double") * 1000000).cast("long"))
    val tri = df.select(q.as("__q")).filter(col("__q").isNotNull)
      .as[Seq[Long]]
      .select(new GramAggregator(dim).toColumn).toDF("t")
    // driver-built (pos → i, j) map for the flat triangle — 2k rows
    val idx = (for (i <- 1 to dim; j <- i to dim) yield (i, j))
      .zipWithIndex.map { case ((i, j), p) => (p + 1, i, j) }
      .toDF("pos", "i", "j")
    tri.select(posexplode(col("t")).as(Seq("pos0", "g")))
      .withColumn("pos", col("pos0") + 1)
      .join(broadcast(idx), "pos")
      .select(col("i"), col("j"), col("g"))
  }

  /** Fit a k-component model: distributed exact Gram + driver Jacobi
    * eigensolve of the mean-centered covariance. ONE corpus scan: the
    * vector is extended with a constant bias dim (0.001 → exactly
    * 1000 micros), so the extended Gram's last column carries the
    * per-dim sums ×1000 and its corner carries n×10⁶ — count, sums,
    * and second moments from a single aggregate (the same trick that
    * fixed the 10-scan NB composition, applied at birth here). The
    * small bias quantum keeps the corner's int64 bound (n < 9.2e12)
    * above the Gram terms' own bound.
    */
  def fit(df: DataFrame, vecCol: Column, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim)
    val tri = gramMicros(df,
      concat(vecCol, array(lit(0.001f))), dim + 1).collect()
    val gx = Array.ofDim[Long](dim + 1, dim + 1)
    tri.foreach { r =>
      val (i, j, v) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getLong(2))
      gx(i)(j) = v; gx(j)(i) = v
    }
    val n = gx(dim)(dim) / 1000000L
    require(n > 1, s"need at least 2 rows to fit PCA, got $n")
    val sums = Array.tabulate(dim)(i => gx(i)(dim) / 1000L)
    val g = Array.tabulate(dim, dim)((i, j) => gx(i)(j).toDouble)
    val mean = sums.map(_.toDouble / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (g(i)(j) / n - mean(i) * mean(j)) / 1e12
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(c => -values(c)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(j => vectors(j)(c))
      // sign canon: largest-|weight| entry positive (ties: first wins)
      val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(comps, order.map(values).toArray, mean.map(_ / 1e6))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Fixed sweep order and
    * a fixed convergence rule keep it bit-deterministic for a given
    * input. O(d³) per sweep — driver-side model work, d ≤ hundreds.
    */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64 && offDiag(a) > 1e-14 * math.max(trace(a).abs, 1e-30)) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
                case 0.0 => 1.0 // theta == 0 → 45° rotation
                case x => x
              }
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j).abs
    s
  }

  private def trace(a: Array[Array[Double]]): Double =
    a.indices.map(i => a(i)(i)).sum

  /** Project onto the model's components: adds `array<double>` of
    * length k (mean-centered dot products). Map-only, codegen HOFs
    * over plan-literal component arrays.
    */
  def project(df: DataFrame, vecCol: Column, model: Model,
              outCol: String = "pca"): DataFrame = {
    val centered = zip_with(vecCol.cast("array<double>"),
      lit(model.means), (x, m) => x - m)
    val staged = df.withColumn("__c", centered)
    val comps = model.components.map { w =>
      aggregate(zip_with(col("__c"), lit(w), (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x)
    }
    staged.withColumn(outCol, array(comps: _*)).drop("__c")
  }

  /** Engine-exact integer projection: quantize the vector to micros
    * (`round(1e6·x)` — the q_v_gram-proven exact step), center on the
    * given LITERAL micro-means, dot with the given LITERAL micro-
    * weights. `proj(c) = Σ_j (q_j − m_j)·w_cj` is pure int64 (bounded
    * by d·(2e6)·max|w| ≈ 1.3e14 for unit-scale embeddings), so any
    * engine handed the same literals computes the identical integers —
    * this is the oracle-able half of PCA: the literals come from the
    * driver's eigensolve ONCE and are interpolated into both the Spark
    * plan and the replaying SQL. Map-only, codegen HOFs; the centered
    * vector is staged as a column so the 8 component dot products
    * don't re-evaluate the quantization (CollapseProject keeps a
    * multiply-referenced non-cheap producer staged).
    */
  def projectMicros(df: DataFrame, vecCol: Column,
                    meanMicros: Array[Long],
                    weightMicros: Array[Array[Long]],
                    outCol: String = "proj"): DataFrame = {
    require(weightMicros.forall(_.length == meanMicros.length),
      "each weight row must match the mean vector's length")
    val centered = zip_with(
      transform(vecCol, x => round(x.cast("double") * 1000000).cast("long")),
      lit(meanMicros), (q, m) => q - m)
    val staged = df.withColumn("__c", centered)
    val comps = weightMicros.map { w =>
      aggregate(zip_with(col("__c"), lit(w), (x, ww) => x * ww),
        lit(0L), (acc, x) => acc + x)
    }
    staged.withColumn(outCol, array(comps: _*)).drop("__c")
  }

  /** Whitened projection: each component scaled by 1/√λ (components
    * with λ ≤ 0 — numerically flat directions — map to 0).
    */
  def whiten(df: DataFrame, vecCol: Column, model: Model,
             outCol: String = "white"): DataFrame = {
    val scales = model.eigenvalues.map(l =>
      if (l > 0) 1.0 / math.sqrt(l) else 0.0)
    project(df, vecCol, model, "__p")
      .withColumn(outCol,
        zip_with(col("__p"), lit(scales), (p, s) => p * s))
      .drop("__p")
  }
}
