package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch-gradient-descent logistic regression with
  * ENGINE-EXACT arithmetic: features, labels, and weights live in
  * integer micros; the per-row probability is the ONLY float
  * (`round(1e6·σ(z))`, margin-probed), and every gradient is an exact
  * int64 sum of `(p_micros − y_micros)·x_micros` — so a fixed
  * iteration count from w=0 is bit-reproducible across partitionings
  * AND replayable by a SQL oracle (each iteration = one aggregate).
  *
  * Execution shape at 100 TB: the featurized corpus is scanned once
  * per iteration (cache/materialize it); each iteration is ONE
  * map-side-combined aggregate producing d+1 driver-side longs — the
  * classic distributed-GD reduce, no parameter server needed below
  * ~10⁶ features. Weight updates are two TRUNCATING divisions
  * (toward zero, like Spark's `div`); int64 bounds hold while
  * n·(1e6)² < 2⁶³, i.e. ~9e6 rows at full-scale micro features —
  * larger corpora coarsen x to centi-micros or train on a sample.
  */
object LogReg {

  /** Truncate-toward-zero division — Long division's native semantics;
    * named so callers (and the SQL oracle's CASE mirror) state intent.
    */
  def truncDiv(a: Long, b: Long): Long = a / b

  /** z in pico units (micros·micros) for weight vector `w`. */
  private def zExpr(w: Array[Long], x: Column): Column =
    w.zipWithIndex.map { case (wj, j) =>
      element_at(x, j + 1) * lit(wj) }.reduce(_ + _)

  /** `round(1e6·σ(z))` — the one float per row. */
  private def pExpr(w: Array[Long], x: Column): Column =
    round(lit(1000000.0)
      / (lit(1.0) + exp(zExpr(w, x).cast("double") / lit(-1e12))))
      .cast("long")

  /** Run `iters` full-batch GD steps from w=0 over rows
    * (`yCol` ∈ {0, 1e6}, `xCol` = array<long> feature micros, element 1
    * conventionally the 1e6 bias). Returns the post-update weight
    * vector after each iteration. `lrPpm` is the learning rate in ppm;
    * the update is `w_j −= trunc(trunc(g_j, n)·lrPpm, 1e12)` — all
    * divisions truncating, so the oracle replays them with a CASE.
    */
  def train(df: DataFrame, yCol: Column, xCol: Column, numFeatures: Int,
            iters: Int, lrPpm: Long): Seq[Array[Long]] = {
    require(iters >= 1 && numFeatures >= 1)
    // materialize the featurized rows ONCE: they are a few longs per
    // row (tiny next to the source corpus), and every iteration would
    // otherwise re-execute the full featurization lineage against the
    // raw corpus — iters corpus scans instead of one
    val base = Materialize.viaScratch(
      df.select(yCol.as("y"), xCol.as("x")), "graft_lr_feat")
    var w = Array.fill(numFeatures)(0L)
    val history = Seq.newBuilder[Array[Long]]
    (1 to iters).foreach { _ =>
      val resid = (pExpr(w, col("x")) - col("y")).as("r")
      val sums = base.select(col("x"), resid)
        .agg(count(lit(1)).as("n"),
          ((0 until numFeatures).map(j =>
            sum(col("r") * element_at(col("x"), j + 1)).as(s"g$j")) ++
          // per-feature max |x_j|, free inside the same aggregate —
          // feeds the overflow guard below
          (0 until numFeatures).map(j =>
            max(abs(element_at(col("x"), j + 1))).as(s"m$j"))): _*)
        .head()
      val n = sums.getLong(0)
      require(n > 0, "empty training set")
      // overflow guard: the gradient Σ r·x_j is a raw int64 sum that
      // would WRAP silently past 2⁶³ (non-ANSI sum), training on
      // corrupt weights with no error. |r| ≤ 1e6 and |x_j| ≤ mX are
      // hard bounds, so n·1e6·mX < 2⁶³ ⟹ no partial sum can wrap.
      // The max feature magnitudes ride the same aggregate — the
      // guard is data-derived and costs zero extra passes.
      val maxAbsX = (0 until numFeatures)
        .map(j => sums.getLong(1 + numFeatures + j)).max max 1L
      require(n <= Long.MaxValue / 1000000L / maxAbsX,
        s"gradient sum could overflow int64: n=$n rows with max " +
          s"|x|=$maxAbsX micros exceeds the n*1e6*maxAbsX < 2^63 " +
          "bound — rescale features or quantize coarser")
      w = w.indices.map { j =>
        w(j) - truncDiv(truncDiv(sums.getLong(j + 1), n) * lrPpm,
          1000000000000L)
      }.toArray
      history += w
    }
    history.result()
  }

  /** Score rows with a trained weight vector: (row, p_micros). */
  def withScore(df: DataFrame, xCol: Column, w: Array[Long],
                outCol: String = "p_micros"): DataFrame =
    df.withColumn(outCol, pExpr(w, xCol))
}
