package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training stage of an LLM data pipeline, Spark-first.
  *
  * The algorithm is a fixpoint over the WORD-COUNT table, not the
  * corpus: one corpus pass builds `(word, count)` (the only shuffle
  * that scales with data size; its payload is the distinct vocabulary,
  * which grows sub-linearly in corpus size), then every merge round
  * runs on that bounded table — an adjacent-pair count (partial
  * aggregation, pair-sized shuffle), a ONE-ROW driver round-trip for
  * the argmax, and a per-word kernel application of the merge.
  *
  * Determinism: counts are exact integers and the argmax tie-break is
  * total (count desc, then pair lexicographic), so the merge sequence
  * is engine-independent — the distributed path, the local fast path,
  * and the spec's reference implementation must agree exactly.
  *
  * Hybrid execution (the [[Dedup.connectedComponents]] pattern): a
  * vocabulary within `maxLocalVocab` is collected once and trained
  * driver-side — per-round Spark jobs over a few thousand rows cost
  * orders of magnitude more than the arithmetic. The distributed path
  * stays the default the moment the vocabulary outgrows the bound,
  * and materializes the evolving symbol table through scratch parquet
  * every few rounds to truncate lineage (NOTES lesson: an iterative
  * plan re-analyzed per round grows without bound).
  */
object BpeTrainer {

  /** One learned merge: rank = order of application. */
  final case class Merge(rank: Int, a: String, b: String)

  /** End-of-word marker (a symbol that cannot collide with text
    * characters after whitespace tokenization).
    */
  val EndOfWord = "</w>"

  /** `(word, cnt)` from whitespace tokens — the corpus-sized pass. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Characters + end-of-word marker — the initial symbol sequence.
    * (`split(w, "")` can emit a trailing empty string under Spark's
    * limit=-1 semantics — filtered so both engines and the local
    * reference agree on the symbol set.)
    */
  private def initialSyms(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0),
      array(lit(EndOfWord)))

  /** Adjacent symbol pairs (empty for 1-symbol sequences — guard the
    * descending-sequence trap: Spark's `sequence(1, 0)` COUNTS DOWN).
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), i =>
        struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Left-to-right, non-overlapping single-pair merge: the BPE inner
    * step, as a native kernel (a stateful scan no higher-order
    * function expresses).
    */
  private[operators] case class MergePairExpr(child: Expression,
                                              a: String, b: String)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType)
    private val ua = UTF8String.fromString(a)
    private val ub = UTF8String.fromString(b)
    private val uab = UTF8String.fromString(a + b)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new java.util.ArrayList[UTF8String](n)
      var i = 0
      while (i < n) {
        if (i + 1 < n && ua == arr.getUTF8String(i) &&
            ub == arr.getUTF8String(i + 1)) {
          out.add(uab); i += 2
        } else { out.add(arr.getUTF8String(i)); i += 1 }
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): MergePairExpr =
      copy(child = c)
  }

  /** Apply a full learned merge LIST in rank order — one kernel pass
    * per word (k merges × m symbols), the encode-side hot loop.
    */
  private[operators] case class ApplyMergesExpr(child: Expression,
                                                merges: Seq[(String, String)])
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType)
    private lazy val ms = merges.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var cur = new scala.collection.mutable.ArrayBuffer[UTF8String](
        arr.numElements())
      var i = 0
      while (i < arr.numElements()) { cur += arr.getUTF8String(i); i += 1 }
      var m = 0
      while (m < ms.length) {
        val (a, b, ab) = ms(m)
        val next = new scala.collection.mutable.ArrayBuffer[UTF8String](
          cur.length)
        var j = 0
        while (j < cur.length) {
          if (j + 1 < cur.length && cur(j) == a && cur(j + 1) == b) {
            next += ab; j += 2
          } else { next += cur(j); j += 1 }
        }
        cur = next
        m += 1
      }
      new GenericArrayData(cur.toArray)
    }
    override protected def withNewChildInternal(c: Expression): ApplyMergesExpr =
      copy(child = c)
  }

  /** `(a, b, n)` — adjacent-pair frequencies over the initial symbol
    * sequences of a `(word, cnt)` table (round-1 of the trainer; the
    * oracle-checkable slice of the loop).
    */
  def pairCounts(wc: DataFrame): DataFrame =
    wc.select(col("cnt"),
        explode(adjacentPairs(initialSyms(col("word")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  def mergePair(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(MergePairExpr(ColumnBridge.expression(syms), a, b))

  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    ColumnBridge.column(ApplyMergesExpr(ColumnBridge.expression(syms),
      merges.sortBy(_.rank).map(m => (m.a, m.b))))

  /** Learn `numMerges` merges from a text corpus. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxLocalVocab: Long = 1L << 20): Seq[Merge] =
    learnFromWordCounts(wordCounts(df, textCol), numMerges, maxLocalVocab)

  /** Learn from a prebuilt `(word, cnt)` table. */
  def learnFromWordCounts(wc: DataFrame, numMerges: Int,
                          maxLocalVocab: Long = 1L << 20): Seq[Merge] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    if (numMerges == 0) return Seq.empty
    val n = wc.count()
    if (n <= maxLocalVocab) {
      // sum duplicate words (a prebuilt table may be a union of
      // per-batch counts) — toMap would keep one arbitrary row and
      // diverge from the distributed path's aggregation
      val local = wc.select(col("word").cast("string"),
        col("cnt").cast("long")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
        .groupMapReduce(_._1)(_._2)(_ + _)
      referenceTrain(local, numMerges)
    } else distributedTrain(wc, numMerges)
  }

  /** UTF-8 byte-wise (= code-point) string order — Spark's binary
    * `orderBy` collation. Java's `String.compareTo` is UTF-16
    * code-UNIT order, which disagrees on supplementary characters
    * (U+E000..U+FFFF sort AFTER U+10000.. there); the reference path
    * must tie-break exactly like the distributed argmax or the two
    * paths diverge on emoji-bearing vocabularies.
    */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def distributedTrain(wc: DataFrame, numMerges: Int): Seq[Merge] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = wc.select(col("cnt"), initialSyms(col("word")).as("syms"))
    var handle: Option[Materialize.Scratch] = None
    var r = 0
    var done = false
    try {
      while (r < numMerges && !done) {
        val top = cur
          .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top.head.getString(0), top.head.getString(1))
          acc += Merge(r, a, b)
          cur = cur.select(col("cnt"), mergePair(col("syms"), a, b).as("syms"))
          // truncate lineage every few rounds (NOTES lesson #7)
          if ((r + 1) % 8 == 0) {
            val (mat, h) = Materialize.viaScratchWithPath(cur, "graft-bpe")
            handle.foreach(_.drop())
            handle = Some(h)
            cur = mat
          }
          r += 1
        }
      }
      acc.toSeq
    } finally handle.foreach(_.drop())
  }

  /** Driver-side reference implementation — the fast path for bounded
    * vocabularies AND the spec's ground truth for the distributed
    * path (both must produce the identical merge sequence).
    */
  private[graft] def referenceTrain(words: Map[String, Long],
                                    numMerges: Int): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] = words.toSeq.map { case (w, c) =>
      (w.split("").toVector :+ EndOfWord) -> c
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax with the DISTRIBUTED tie-break: count desc, then
        // UTF-8 byte order on (a, b) — see [[utf8Compare]]
        val ord = new Ordering[((String, String), Long)] {
          def compare(x: ((String, String), Long),
                      y: ((String, String), Long)): Int = {
            val c = java.lang.Long.compare(y._2, x._2) // count desc
            if (c != 0) c
            else {
              val ca = utf8Compare(x._1._1, y._1._1)
              if (ca != 0) ca else utf8Compare(x._1._2, y._1._2)
            }
          }
        }
        val (a, b) = counts.toSeq.min(ord)._1
        out += Merge(r, a, b)
        // via Seq: Map.map would silently last-win on (impossible by
        // construction, but let the types not depend on that) key
        // collisions
        vocab = vocab.toSeq.map { case (syms, c) =>
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              next += (a + b); i += 2
            } else { next += syms(i); i += 1 }
          }
          next.toVector -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
        r += 1
      }
    }
    out.toSeq
  }

  /** Segment every whitespace token of `textCol` with a learned merge
    * list; output one row-level array of subword symbols (tokens'
    * segmentations concatenated in order).
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge],
             outCol: String = "bpe_tokens"): DataFrame =
    df.withColumn(outCol,
      flatten(transform(
        graft.functions.TextFunctions.tokens(col(textCol)),
        w => applyMerges(initialSyms(w), merges))))
}
