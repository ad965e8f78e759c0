package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-16 chars: all patterns matched in
  * ONE left-to-right pass per document, O(|text| + matches), instead
  * of one `contains`/`LIKE` scan per pattern. Built once on the driver
  * from the pattern list and shipped inside the serialized plan (it is
  * a few KB for a few thousand patterns); the scan kernel participates
  * in whole-stage codegen like the other native kernels.
  *
  * Match semantics (what the DuckDB oracle replays with per-position
  * `substr` equality): every occurrence counts, INCLUDING overlapping
  * ones and patterns that are substrings of other patterns — standard
  * AC output-link semantics. Matching is case-sensitive and exact,
  * over UTF-16 code units — identical to codepoint matching for BMP
  * text (an astral-plane pattern matches as its surrogate pair, which
  * is still exact, but positions/counts then differ from a
  * codepoint-based oracle). Callers wanting case-folding lower() both
  * sides.
  *
  * Scale shape for the 100 TB content-filter stage: the automaton is
  * plan-shipped state (no join, no shuffle); the scan is a map-only
  * projection that stays inside WholeStageCodegen, so filtering a
  * corpus against a P-pattern blocklist costs one data pass
  * regardless of P — the naive form is P passes (or one pass with P
  * regex engines), which is the difference between hours and weeks at
  * corpus scale.
  */
final class AcAutomaton private (
    private val charKeys: Array[Array[Char]],
    private val nextState: Array[Array[Int]],
    private val fail: Array[Int],
    private val emit: Array[Array[Int]],
    val numPatterns: Int) extends Serializable {

  private def step(state0: Int, c: Char): Int = {
    var state = state0
    while (true) {
      val keys = charKeys(state)
      val i = java.util.Arrays.binarySearch(keys, c)
      if (i >= 0) return nextState(state)(i)
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }

  /** (total occurrences across all patterns, distinct patterns present). */
  def scan(text: String): (Long, Long) = {
    var hits = 0L
    val seen = new Array[Boolean](numPatterns)
    var distinct = 0L
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      val out = emit(state)
      var j = 0
      while (j < out.length) {
        hits += 1
        if (!seen(out(j))) { seen(out(j)) = true; distinct += 1 }
        j += 1
      }
      i += 1
    }
    (hits, distinct)
  }
}

object AcAutomaton {

  /** Build the trie + BFS failure links + merged output sets. Patterns
    * must be non-empty and distinct (duplicates would double-count the
    * same match); both are validated eagerly so a bad blocklist fails
    * at construction, not per-row.
    */
  def apply(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(p => p != null && p.nonEmpty),
      "null/empty pattern")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns would double-count matches")

    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        node = children(node).getOrElseUpdate(c, {
          children += mutable.TreeMap.empty[Char, Int]
          ends += Nil
          children.size - 1
        })
      }
      ends(node) = pid :: ends(node)
    }

    val n = children.size
    val fail = new Array[Int](n)
    val emit = new Array[Array[Int]](n)
    emit(0) = ends(0).reverse.toArray
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      emit(u) = (ends(u).reverse ++ emit(fail(u))).toArray
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        queue += v
      }
    }

    new AcAutomaton(
      children.map(_.keysIterator.toArray).toArray,
      children.map(_.valuesIterator.toArray).toArray,
      fail, emit, patterns.size)
  }
}

/** Static forwarder for generated code (same pattern as NativeKernels:
  * an object with no companion class compiles to a static method).
  */
object AcKernel {
  def scan(text: UTF8String, aut: AcAutomaton): ArrayData = {
    val (hits, distinct) = aut.scan(text.toString)
    new GenericArrayData(Array(hits, distinct))
  }
}

object Blocklist {

  /** `array<long>[total occurrences, distinct patterns present]` from
    * one AC pass over the text.
    */
  case class AcScan(child: Expression, patterns: Seq[String])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // rebuilt lazily per deserialized instance (executor side takes the
    // interpreted path); the codegen path ships the driver-built one
    // through the references array
    @transient private lazy val aut: AcAutomaton = AcAutomaton(patterns)
    override def nullSafeEval(input: Any): Any =
      AcKernel.scan(input.asInstanceOf[UTF8String], aut)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val autRef = ctx.addReferenceObj("acAutomaton", aut,
        classOf[AcAutomaton].getName)
      defineCodeGen(ctx, ev,
        c => s"graft.operators.AcKernel.scan($c, $autRef)")
    }
    override protected def withNewChildInternal(c: Expression): AcScan =
      copy(child = c)
  }

  def acCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcScan(ColumnBridge.expression(text), patterns))

  /** Adds `n_hits` (total occurrences, overlapping included) and
    * `n_patterns` (distinct blocklist entries present) — one scan, two
    * metrics (the two element_at's share the AcScan subtree through
    * projection-level subexpression elimination).
    */
  def tag(df: DataFrame, textCol: String,
          patterns: Seq[String]): DataFrame = {
    val counts = acCounts(col(textCol), patterns)
    df.withColumn("n_hits", element_at(counts, 1))
      .withColumn("n_patterns", element_at(counts, 2))
  }

  /** The filter composition: documents with zero blocklist hits. */
  def clean(df: DataFrame, textCol: String,
            patterns: Seq[String]): DataFrame =
    df.filter(element_at(acCounts(col(textCol), patterns), 1) === 0L)
}
