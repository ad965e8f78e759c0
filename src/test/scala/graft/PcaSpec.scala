package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** Ground truth for the PCA/whitening operator: the exact-integer Gram
  * against a Scala replay, the eigensolve against its defining
  * identities, the variance-matches-eigenvalue contract of the
  * projection, and the quantization-boundary argument.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val vecs: Array[Array[Float]] =
    emb.select(col("embedding")).as[Array[Float]].collect()

  // away-from-zero half rounding — Spark round()'s HALF_UP and
  // DuckDB round()'s shared rule (math.round would round -x.5 UP)
  private def q(x: Float): Long = BigDecimal(x.toDouble * 1000000)
    .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("gramMicros == exact Scala replay on sf0.001 embeddings") {
    val got = Pca.gramMicros(emb, col("embedding"), dim)
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, g) => (i, j) -> g }.toMap
    assert(got.size == dim * (dim + 1) / 2)
    val expect = Array.ofDim[Long](dim, dim)
    vecs.foreach { v =>
      for (i <- 0 until dim; j <- i until dim)
        expect(i)(j) += q(v(i)) * q(v(j))
    }
    for (i <- 0 until dim; j <- i until dim)
      assert(got((i + 1, j + 1)) == expect(i)(j), s"g($i,$j)")
  }

  test("float·1e6 quantization is exact in double (24+20 mantissa " +
    "bits < 53), so .5 landings are the SAME exact value in both " +
    "engines and the shared away-from-zero rule breaks them identically") {
    val rnd = new scala.util.Random(3)
    val million = new java.math.BigDecimal(1000000)
    (1 to 100000).foreach { _ =>
      val f = (rnd.nextFloat() - 0.5f) * 2
      val x = f.toDouble * 1000000.0
      // unlimited-precision decimal product (Scala's BigDecimal would
      // round at 34 digits and fake an inexactness)
      val exact = new java.math.BigDecimal(f.toDouble).multiply(million)
      assert(exact.compareTo(new java.math.BigDecimal(x)) == 0, s"$f inexact")
    }
    // a coarse-mantissa float CAN land exactly on .5 micros
    // (23/128 · 1e6 = 179687.5) — pin that Spark's round() breaks it
    // away from zero on BOTH signs, the rule DuckDB's round() shares
    val half = Seq(0.1796875f, -0.1796875f).toDF("f")
      .select(round(col("f").cast("double") * 1000000).cast("long"))
      .as[Long].collect().toSeq
    assert(half == Seq(179688L, -179688L), s"rounding rule drifted: $half")
  }

  test("fit: eigenvectors orthonormal, eigenvalues descending, " +
    "V·diag(λ)·Vᵀ reconstructs the covariance on its span") {
    val model = Pca.fit(emb, col("embedding"), dim, dim) // full basis
    val V = model.components // k rows × dim
    for (a <- V.indices; b <- a until V.length) {
      val d = V(a).zip(V(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"V($a)·V($b) = $d")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // reconstruct the covariance from the full eigenbasis
    val n = vecs.length
    val mean = Array.tabulate(dim)(j => vecs.map(v => q(v(j))).sum.toDouble / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (vecs.map(v => q(v(i)) * q(v(j))).sum.toDouble / n
        - mean(i) * mean(j)) / 1e12
    }
    for (i <- 0 until dim; j <- 0 until dim) {
      val r = V.indices.map(c =>
        model.eigenvalues(c) * V(c)(i) * V(c)(j)).sum
      assert(math.abs(r - cov(i)(j)) < 1e-9, s"cov($i,$j): $r vs ${cov(i)(j)}")
    }
  }

  test("projection variance per component == eigenvalue; whitened " +
    "variance == 1; fit is partitioning-invariant bit-for-bit") {
    val k = 8
    val model = Pca.fit(emb, col("embedding"), dim, k)
    val proj = Pca.project(emb, col("embedding"), model)
      .select(col("pca")).as[Array[Double]].collect()
    val n = proj.length
    (0 until k).foreach { c =>
      val m = proj.map(_(c)).sum / n
      val variance = proj.map(p => (p(c) - m) * (p(c) - m)).sum / n
      assert(math.abs(variance - model.eigenvalues(c))
        < 1e-6 * math.max(model.eigenvalues(c), 1e-9),
        s"component $c variance $variance vs λ ${model.eigenvalues(c)}")
    }
    val white = Pca.whiten(emb, col("embedding"), model)
      .select(col("white")).as[Array[Double]].collect()
    (0 until k).foreach { c =>
      val m = white.map(_(c)).sum / n
      val variance = white.map(p => (p(c) - m) * (p(c) - m)).sum / n
      assert(math.abs(variance - 1.0) < 1e-6, s"white $c variance $variance")
    }
    val m2 = Pca.fit(emb.repartition(13), col("embedding"), dim, k)
    assert(m2.components.map(_.toSeq).toSeq ==
      model.components.map(_.toSeq).toSeq)
    assert(m2.eigenvalues.toSeq == model.eigenvalues.toSeq)
  }

  test("projectMicros == exact Scala integer replay (the oracle-able " +
    "projection: literal micro means/weights, pure int64)") {
    val k = 8
    val model = Pca.fit(emb, col("embedding"), dim, k)
    val mMic = model.means.map(x => Math.round(x * 1e6))
    val wMic = model.components.map(_.map(x => Math.round(x * 1e6)))
    val got = Pca.projectMicros(
        emb.select(col("vec_id"), col("embedding")),
        col("embedding"), mMic, wMic)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Array[Long])].collect().toMap
    val ids = emb.select(col("vec_id")).as[Long].collect()
    assert(got.size == ids.length)
    ids.zip(vecs).foreach { case (id, v) =>
      val expect = wMic.map { w =>
        var s = 0L
        var j = 0
        while (j < dim) { s += (q(v(j)) - mMic(j)) * w(j); j += 1 }
        s
      }
      assert(got(id).toSeq == expect.toSeq, s"vec $id")
    }
  }
}
