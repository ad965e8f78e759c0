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
}
