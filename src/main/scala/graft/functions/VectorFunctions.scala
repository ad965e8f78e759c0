package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely
  * from Spark's codegen'd higher-order functions (`zip_with`,
  * `aggregate`, `transform`) — no UDFs, no serialization boundary, and
  * the expressions stay inside whole-stage codegen.
  *
  * All arithmetic is promoted to double and accumulated left-to-right
  * (Spark's `aggregate` is a sequential fold), which makes results
  * bit-reproducible for a given element order — the property the
  * DuckDB oracle comparison relies on.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) ∈ [-1, 1]; null-safe on zero vectors (returns null
    * rather than NaN so downstream filters drop them cleanly).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(null).cast("double")).otherwise(d / den)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions —
    * the embedding-compression pass (store/search in 16 dims, rerank
    * survivors in full precision). The projection matrix is DERIVED,
    * never stored or shipped: w(i,j) = ((i·2654435761 + j·40503) mod
    * 65536)/65536 − 0.5, plain integer arithmetic both engines replay
    * exactly — which is what makes the reduced vectors themselves
    * oracle-checkable (a seeded-RNG matrix would be engine-private).
    * Output accumulates left-to-right in double like every kernel
    * here.
    */
  def randomProjection(v: Column, outDim: Int): Column = {
    require(outDim > 0, "outDim must be positive")
    // empty-vector guard: sequence(0, −1) counts DOWN to [0, −1],
    // zip_with null-pads, and null poisons the fold — an empty input
    // projects to the zero vector, not [null × outDim]
    when(size(v) === 0, array_repeat(lit(0.0), outDim))
      .otherwise(transform(sequence(lit(0L), lit(outDim - 1L)), j =>
        aggregate(
          zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
            (x, i) => x.cast("double") *
              (pmod(i * lit(2654435761L) + j * lit(40503L), lit(65536L))
                .cast("double") / 65536.0 - 0.5)),
          lit(0.0), (acc, x) => acc + x)))
  }

  /** Random-hyperplane signature: bit i = sign(v · hᵢ), packed into a
    * Long. The planes are generated driver-side from a fixed seed and
    * inlined as literals — every executor evaluates the same planes
    * with zero shuffle/broadcast cost. This is the SimHash-for-vectors
    * primitive behind LSH bucketing for near-dup detection and ANN.
    *
    * @param nBits ≤ 63 hyperplanes
    * @param dim   embedding dimensionality
    */
  def hyperplaneSignature(v: Column, dim: Int, nBits: Int = 16,
                          seed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a Long")
    val rnd = new scala.util.Random(seed)
    // fixed gaussian planes, row-major nBits × dim
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val bitCols = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(v, typedlit(planes(i).toSeq), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two packed signatures. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Per-vector max-abs scale for int8 quantization. */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization, STAGED: adds `scaleCol` = max|x| and
    * `qCol` with qᵢ = round(xᵢ · 127 / scale) — 4× smaller ANN storage
    * (the standard vector-store compression), recoverable to ~1%
    * relative error via scale/127. The scale must be its own column
    * BEFORE the transform lambda references it: a sub-expression inside
    * a higher-order-function lambda is re-evaluated PER ELEMENT (no
    * CSE), which would make this O(dim²) per row — the same trap that
    * cost 30× in MinHash. Pure codegen'd array expressions, zero
    * shuffle; an all-zero vector quantizes to zeros (not NaN). The
    * arithmetic is fixed-order double ops, bit-identical across
    * engines (oracle-gated; round-boundary margin on the test corpus
    * audited at 3e-6).
    */
  def withQuantizedInt8(df: org.apache.spark.sql.DataFrame, vecCol: String,
                        qCol: String = "q8",
                        scaleCol: String = "q_scale"): org.apache.spark.sql.DataFrame =
    df.withColumn(scaleCol, maxAbs(col(vecCol)))
      .withColumn(qCol,
        when(col(scaleCol) === 0.0,
          transform(col(vecCol), _ => lit(0).cast("int")))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") * 127.0 / col(scaleCol)).cast("int"))))
}
