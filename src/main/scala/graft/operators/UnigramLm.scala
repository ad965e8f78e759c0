package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model tokenizer (the SentencePiece-unigram family
  * — Kudo 2018), trained with hard EM: seed a substring vocabulary,
  * then alternate Viterbi segmentation of the word table (E-step,
  * counts) with count-renormalized piece scores (M-step). The BPE
  * trainer's sibling: BPE grows a vocabulary bottom-up by merges;
  * unigram starts over-complete and lets EM concentrate mass on the
  * pieces that actually explain the corpus.
  *
  * Exactness discipline (the KN/DSIR convention): piece scores are
  * log-probabilities in MICROS, rounded ONCE per piece per round —
  * `round(1e6 · ln(cnt/C))` computed in the DataFrame layer (Spark
  * `round`/`log` ≡ DuckDB `round`/`ln`, half-away-from-zero both
  * sides) — and the Viterbi DP then runs in pure int64 (score sums
  * and comparisons are exact integer arithmetic, so the argmax path
  * is engine-reproducible and the WHOLE trainer replays in SQL as
  * unrolled DP + backtrack CTEs, one set per EM round). Ties break
  * deterministically: higher path score, then LONGER piece.
  *
  * Scale shape: the word table is one token-explode aggregation; the
  * vocabulary is bounded (topV + alphabet) and rides as a broadcast
  * int64 score map; Viterbi is per-DISTINCT-word local DP inside
  * `mapPartitions` (genuine per-row imperative logic — no builtin
  * expresses a DP argmax) — linear in distinct words, never in corpus
  * tokens; E-step counts are one groupBy. Driver holds only the
  * bounded vocabulary, never words.
  *
  * Training ignores words longer than `maxWordLen` (the SentencePiece
  * max-sentencepiece-length discipline: tail mega-tokens contribute
  * noise and unbounded DP cost); `encode` segments EVERY word — single
  * characters stay in the vocabulary across rounds (coverage floor
  * `greatest(cnt, 1)`), so segmentation is total.
  */
object UnigramLm {

  /** `(word, f)` — the distinct-word frequency table, training-bounded. */
  def wordTable(df: DataFrame, textCol: String,
                maxWordLen: Int = 16): DataFrame =
    df.select(explode(TextFunctions.tokens(
        coalesce(col(textCol), lit("")))).as("word"))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("f"))

  /** Seed vocabulary: every substring of length 1..maxPieceLen counted
    * with positional multiplicity × word frequency; keep the top
    * `topV` by (cnt DESC, piece ASC) plus ALL single characters (the
    * coverage floor that keeps Viterbi total).
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int = 4,
                topV: Int = 512): DataFrame = {
    val subs = words
      .select(col("word"), col("f"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("f"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i") + 1)))
          .as("l"))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("f"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
    val top = subs.orderBy(col("cnt").desc, col("piece").asc).limit(topV)
    val chars = subs.filter(length(col("piece")) === 1)
    top.unionByName(chars)
      .groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** `(piece, cnt, s)`: s = round(1e6 · ln(cnt/C)) with C = Σ cnt —
    * the once-per-piece float rounding; everything downstream is
    * integer. Computed in the DataFrame layer so Spark and the SQL
    * oracle share round/ln semantics exactly.
    */
  def withScores(vocab: DataFrame): DataFrame = {
    val c = vocab.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    require(c > 0L, "empty vocabulary — no training words")
    vocab.select(col("piece"), col("cnt"),
      round(lit(1000000.0) * log(col("cnt").cast("double") / lit(c.toDouble)))
        .cast("long").as("s"))
  }

  /** Score assigned to a single character the training corpus never
    * saw (byte-fallback analogue): far below any trained piece
    * (ln ≈ e⁻²⁰), so an unknown character never displaces a trained
    * parse of its neighbors, but segmentation stays TOTAL on data the
    * trainer didn't see — production encode cannot crash on a new
    * alphabet. The trainer's own word table never needs it (every
    * training char seeds the vocabulary).
    */
  val UnkScoreMicros: Long = -20000000L

  /** Integer-micros Viterbi over one word. `scores` maps piece →
    * score; single characters missing from it fall back to
    * [[UnkScoreMicros]] (self-emitting unknowns), keeping the DP
    * total. Returns the argmax path's pieces left to right.
    * Tie-break: higher score, then LONGER piece — identical to the
    * SQL replay's `ORDER BY sc DESC, l DESC`.
    */
  private[graft] def segment(word: String,
                             scores: collection.Map[String, Long],
                             maxPieceLen: Int): Seq[String] = {
    val n = word.length
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, Long.MinValue)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val i = j - l
        if (dp(i) != Long.MinValue) {
          val sub = word.substring(i, j)
          val sc = scores.get(sub) match {
            case Some(s) => Some(s)
            case None if l == 1 => Some(UnkScoreMicros)
            case None => None
          }
          sc match {
            case Some(s) =>
              val cand = dp(i) + s
              // strictly-greater OR equal-with-longer-piece: since l
              // ascends, "equal and longer" is cand == dp(j) && l > bp(j),
              // which the >= on later (longer) l implements exactly
              if (cand > dp(j) || (cand == dp(j) && l > bp(j))) {
                dp(j) = cand; bp(j) = l
              }
            case None =>
          }
        }
        l += 1
      }
      j += 1
    }
    // backtrack
    var pos = n
    var out = List.empty[String]
    while (pos > 0) {
      val l = bp(pos)
      out = word.substring(pos - l, pos) :: out
      pos -= l
    }
    out
  }

  /** E-step: Viterbi-segment the word table under `scored` (piece,
    * cnt, s) and return per-piece path counts weighted by word
    * frequency. The vocabulary is bounded → broadcast; the DP is
    * per-distinct-word local work.
    */
  def viterbiCounts(words: DataFrame, scored: DataFrame,
                    maxPieceLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val m = scored.select(col("piece"), col("s")).as[(String, Long)]
      .collect().toMap
    val bc = spark.sparkContext.broadcast(m)
    words.select(col("word"), col("f")).as[(String, Long)]
      .mapPartitions { it =>
        val sc = bc.value
        it.flatMap { case (w, f) =>
          segment(w, sc, maxPieceLen).map(p => (p, f))
        }
      }
      .toDF("piece", "f")
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
  }

  /** M-step: pieces keep their Viterbi count; zero-count pieces drop
    * EXCEPT single characters, which floor at 1 (coverage). With
    * `targetV` set, additionally prune to the top `targetV` pieces by
    * (cnt DESC, piece ASC) — single characters always survive (the
    * SentencePiece prune-to-vocab-size control, hard-EM edition: EM
    * re-concentrates the surviving mass next round).
    */
  def mStep(vocab: DataFrame, counts: DataFrame,
            targetV: Option[Int] = None): DataFrame = {
    val kept = vocab.select(col("piece"))
      .join(counts, Seq("piece"), "left")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("cnt"), lit(0L)), lit(1L)))
          .otherwise(coalesce(col("cnt"), lit(0L))).as("cnt"))
      .filter(col("cnt") > 0L)
    targetV match {
      case None => kept
      case Some(v) =>
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("piece").asc)
        // single-partition window: the vocabulary is bounded (≤ topV +
        // alphabet rows) — this ranks a driver-sized table, never data
        kept.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= v || length(col("piece")) === 1)
          .select(col("piece"), col("cnt"))
    }
  }

  /** Full trainer: seed → `rounds` × (E-step, M-step) → scored
    * vocabulary `(piece, cnt, score_micros)`. `targetV` prunes each
    * M-step to a vocabulary-size budget (single chars exempt).
    */
  def train(df: DataFrame, textCol: String, rounds: Int = 2,
            maxPieceLen: Int = 4, topV: Int = 512,
            maxWordLen: Int = 16, targetV: Option[Int] = None): DataFrame = {
    val words = wordTable(df, textCol, maxWordLen)
    // the word table feeds every round AND the doc encode — one scan.
    // try/finally: the empty-corpus loud failure (withScores) must not
    // leak the cached table into the session (the cache-hygiene
    // contract, QueriesSpec / VERDICT r3); blocking so a hygiene check
    // right after the operator returns sees zero persisted blocks
    words.cache()
    try {
      var vocab = seedVocab(words, maxPieceLen, topV)
      var r = 0
      while (r < rounds) {
        val scored = withScores(vocab)
        vocab = mStep(vocab, viterbiCounts(words, scored, maxPieceLen),
          targetV)
        r += 1
      }
      val out = withScores(vocab)
        .select(col("piece"), col("cnt"), col("s").as("score_micros"))
      out.count() // materialize before unpersist
      out
    } finally words.unpersist(blocking = true)
  }

  // ── Vocabulary shipping (the tokenizer-deployment artifact) ────────
  // A trained tokenizer is an OFFLINE artifact: train once, ship the
  // vocabulary, and every consumer (encode / surprisal / packing) runs
  // without retraining — the IVF ensureIndex contract applied to the
  // tokenizer. The artifact persists maxPieceLen WITH the pieces: a
  // consumer who reloads the vocabulary but segments under a different
  // maxPieceLen than training gets silently different parses (longer
  // trained pieces become unreachable, or untrained lengths open up) —
  // the one parameter mismatch the pieces table itself cannot reveal.

  /** Persist a trained vocabulary: `<path>/pieces` (bounded parquet,
    * one file) + `<path>/_VOCAB_META` (`maxPieceLen=<n>`).
    */
  def saveVocab(scored: DataFrame, maxPieceLen: Int, path: String): Unit = {
    val spark = scored.sparkSession
    scored.select(col("piece"), col("cnt"), col("score_micros"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pieces")
    val p = new org.apache.hadoop.fs.Path(s"$path/_VOCAB_META")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    o.write(s"maxPieceLen=$maxPieceLen".getBytes("UTF-8")); o.close()
  }

  /** Reload a shipped vocabulary: `(scored pieces, maxPieceLen)`.
    * Loud on a malformed artifact (missing meta, wrong schema) — a
    * tokenizer mismatch must never degrade into silent resegmentation.
    */
  def loadVocab(spark: SparkSession, path: String): (DataFrame, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_VOCAB_META")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"not a unigram vocab artifact (no _VOCAB_META): $path")
    val in = fs.open(p)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val maxPieceLen = meta.linesIterator
      .collectFirst { case s if s.startsWith("maxPieceLen=") =>
        s.stripPrefix("maxPieceLen=").trim.toInt }
      .getOrElse(throw new IllegalArgumentException(
        s"malformed _VOCAB_META at $path: '$meta'"))
    val pieces = spark.read.parquet(s"$path/pieces")
    val need = Set("piece", "cnt", "score_micros")
    require(need.subsetOf(pieces.columns.toSet),
      s"vocab schema mismatch at $path: ${pieces.columns.mkString(",")}")
    (pieces.select(col("piece"), col("cnt"), col("score_micros")),
      maxPieceLen)
  }

  /** Build-if-stale shipped vocabulary ([[graft.engine.Scratch.ensureAt]]
    * freshness protocol): retrains only when the source corpus or any
    * training parameter changes; otherwise the artifact on disk serves
    * every consumer. Returns [[loadVocab]]'s reload of it.
    */
  def ensureVocab(df: DataFrame, sourcePath: String, vocabPath: String,
                  textCol: String, rounds: Int = 2, maxPieceLen: Int = 4,
                  topV: Int = 512, maxWordLen: Int = 16,
                  targetV: Option[Int] = None): (DataFrame, Int) = {
    graft.engine.Scratch.ensureAt(df.sparkSession, vocabPath, sourcePath,
      fingerprint = s"src=$sourcePath,textCol=$textCol,rounds=$rounds," +
        s"maxPieceLen=$maxPieceLen,topV=$topV,maxWordLen=$maxWordLen," +
        s"targetV=${targetV.getOrElse(-1)}",
      markerName = "_VOCAB_READY") { dir =>
      saveVocab(train(df, textCol, rounds, maxPieceLen, topV, maxWordLen,
        targetV), maxPieceLen, dir)
    }
    loadVocab(df.sparkSession, vocabPath)
  }

  /** Per-document LM surprisal under a trained vocabulary: `(id,
    * n_pieces, score_micros)` where score_micros = Σ piece scores
    * along each token's Viterbi path (≡ the DP's final value — an
    * integer, so the quality signal is engine-exact). The CCNet-style
    * filter's scoring half with the unigram LM in place of KN:
    * low-scoring docs (per piece) are the distribution outliers.
    */
  def surprisal(df: DataFrame, textCol: String, idCol: String,
                scored: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = scored.select(col("piece"), col("score_micros"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(m)
    df.select(col(idCol).cast("long"),
        TextFunctions.tokens(coalesce(col(textCol), lit(""))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val sc = bc.value
        it.map { case (id, toks) =>
          val pieces = toks.flatMap(w => segment(w, sc, maxPieceLen))
          val total = pieces.iterator
            .map(p => sc.getOrElse(p, UnkScoreMicros)).sum
          (id, pieces.length.toLong, total)
        }
      }
      .toDF(idCol, "n_pieces", "score_micros")
  }

  /** Segment every document under a trained vocabulary: `(id, encoded,
    * n_pieces)` with pieces space-joined in token order (array-typed
    * gate columns crash the driver compare — the q_t_postings CSV
    * convention).
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             scored: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = scored.select(col("piece"), col("score_micros"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(m)
    df.select(col(idCol).cast("long"),
        TextFunctions.tokens(coalesce(col(textCol), lit(""))))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val sc = bc.value
        it.map { case (id, toks) =>
          val pieces = toks.flatMap(w => segment(w, sc, maxPieceLen))
          (id, pieces.mkString(" "), pieces.length.toLong)
        }
      }
      .toDF(idCol, "encoded", "n_pieces")
  }
}
