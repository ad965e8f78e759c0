package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{shingles, shinglesFromTokens, tokens}

/** Deduplication operators for large-corpus training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard. Everything is
  * shuffle-conscious:
  *
  *  - exact dedup groups on a 128-bit content hash, never the raw
  *    text, so the shuffle carries 16 bytes + the id per row instead
  *    of documents;
  *  - MinHash/SimHash signatures are computed scan-side with
  *    codegen'd higher-order functions (one pass, no UDF); only the
  *    (band, bucket, id) triples shuffle — candidate generation never
  *    compares all pairs (O(n·bands), not O(n²));
  *  - candidate pairs are then verified with exact Jaccard on the
  *    candidate set only.
  *
  * At 100 TB: the band-bucket groupBy is the single shuffle; bucket
  * skew (a degenerate shingle shared by millions of docs) is bounded
  * by `maxBucketSize`, which drops pathological buckets the same way
  * production dedup pipelines cap posting lists.
  */
object Dedup {

  /** Exact dedup: one surviving row id per distinct content. Keeps the
    * smallest id (deterministic). Output: (hash, doc_id). Null content
    * is excluded: md5(null) is null, so grouping would collapse every
    * null-text row into ONE group — but unknown content is unknown,
    * not equal, and must never be deduplicated away.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol))

  /** Exact dedup preserving full rows: keeps the min-id row per
    * distinct content via a semi join back (no row-serializing window
    * over the whole corpus). Null-text rows all survive (see
    * [[exactByHash]]).
    */
  def exactRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(exactByHash(df, textCol, idCol).select(col(idCol)),
        Seq(idCol), "left_semi")
      .unionByName(df.filter(col(textCol).isNull))

  /** Line-level boilerplate removal (the C4/CCNet corpus-cleanup
    * stage): a LINE occurring in at least `minDocs` distinct documents
    * is removed from every document — navigation chrome, cookie
    * banners, footers. Lines shorter than `minLineLen` characters are
    * never counted or removed (short lines repeat for honest reasons);
    * remaining lines keep their original order, a null document stays
    * null, and a fully-boilerplate document becomes the empty string.
    *
    * Scale shape: one (id, line) explode feeds the repeated-line
    * aggregation; that table is SMALL by construction (it is the
    * boilerplate of the corpus), so the removal anti-join broadcasts
    * it and the big side is never shuffled. Reassembly is a per-doc
    * grouped sort of (pos, line) — one shuffle of the corpus's lines
    * on doc id, no window over the whole corpus.
    */
  def dropRepeatedLines(df: DataFrame, textCol: String, idCol: String,
                        minDocs: Int = 2, minLineLen: Int = 10): DataFrame = {
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    val repeated = df
      .select(col(idCol).as("__rid"),
        explode(split(col(textCol), "\n")).as("__ln"))
      .filter(length(col("__ln")) >= minLineLen)
      .distinct()
      .groupBy(col("__ln")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__ln"))
    // anti-join on line equality: a kept-by-length short line can never
    // equal a counted long one, so no length re-check is needed
    val kept = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("__pos", "__ln")))
      .join(broadcast(repeated), Seq("__ln"), "left_anti")
    val clean = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__ln")))),
          x => x.getField("__ln")), "\n").as("__clean"))
    df.join(clean, Seq(idCol), "left")
      .withColumn(textCol,
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))))
      .drop("__clean")
  }

  /** Exact duplicated-span report (the diagnostic behind substring-
    * level dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better"): every `n`-token window occurring in at
    * least `minDocs` DISTINCT documents, with its document count and
    * total occurrence count. Token = whitespace-split of the trimmed,
    * lower-cased text (the engine's canonical tokenization).
    *
    * Execution shape: one pass builds each document's windows as a
    * staged array column (the token array is bound once — never
    * re-evaluated per window, NOTES lesson #1), one explode, one
    * grouped count. The shuffle key is the span string; at 100 TB
    * you'd pre-hash to 64 bits and carry (hash, span) to shrink the
    * exchange — the grouping is exact either way.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"span length must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), raw"\s+"),
          t => length(t) > 0).as("__toks"))
    val spans = toks
      .select(col(idCol),
        explode(when(size(col("__toks")) >= n,
          transform(sequence(lit(1), size(col("__toks")) - n + 1),
            i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))
          .otherwise(typedlit(Seq.empty[String]))).as("span"))
    spans.groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Duplicated-span REMOVAL (the operator behind the [[duplicateSpans]]
    * diagnostic — Lee et al. 2022's ExactSubstr dedup, token-level):
    * emit each document's cleaned text with cross-doc duplicated spans
    * excised, keeping exactly one canonical occurrence corpus-wide.
    *
    * Rule (deterministic, engine-independent): a duplicated window is
    * an `n`-token span occurring in ≥ `minDocs` distinct documents; its
    * CANONICAL occurrence is the (min doc id, then min start) one. A
    * token survives iff no duplicated window covers it, or at least one
    * canonical-occurrence window does. Overlapping duplicated windows
    * merge naturally (coverage is a union of token indexes — no
    * boundary arithmetic), a document that is a full copy of an
    * earlier one cleans to the empty string, a WITHIN-doc repeat of a
    * cross-doc-duplicated span is excised even in the canonical
    * document (all-but-one occurrence survives corpus-wide, which is
    * the Lee-et-al contract), null text stays null, and a document
    * shorter than `n` tokens passes through untouched.
    *
    * The cleaned text is reassembled from the canonical tokenization
    * (trim → lower → whitespace split, same as [[duplicateSpans]]), so
    * original casing/whitespace is not preserved — span excision is a
    * *corpus* transform, applied before (not instead of) formatting-
    * sensitive stages.
    *
    * Execution shape: windows are built as a staged array per doc (one
    * pass, token array bound once), then ONE span-keyed shuffle finds
    * duplicated spans + their canonical occurrence, one join marks each
    * occurrence canonical-or-not (the dup-span table is corpus-derived
    * and cannot be assumed broadcastable — this is a shuffle join on
    * the span string; at 100 TB carry a 64-bit span hash instead), and
    * one doc-keyed shuffle reassembles surviving tokens. No window
    * functions, no per-row UDFs.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"span length must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    val toks = spanToks(df, textCol, idCol)
    val wins = spanWindows(toks, idCol, n)
    // duplicated spans with their canonical occurrence in ONE
    // aggregation: structs order lexicographically, so min(struct(id,
    // start)) is exactly (min doc, then min start within it)
    val dup = wins.groupBy(col("__span"))
      .agg(countDistinct(col(idCol)).as("__nd"),
        min(struct(col(idCol).as("cid"), col("__start").as("cstart")))
          .as("__c"))
      .filter(col("__nd") >= minDocs)
      .select(col("__span"), col("__c.cid").as("__cid"),
        col("__c.cstart").as("__cstart"))
    val removed = wins.join(dup, Seq("__span"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + n - 1))
          .as("__idx"),
        when(col(idCol) === col("__cid") &&
          col("__start") === col("__cstart"), 1).otherwise(0).as("__isc"))
      .groupBy(col(idCol), col("__idx"))
      .agg(max(col("__isc")).as("__anyc"))
      .filter(col("__anyc") === 0)
      .select(col(idCol), col("__idx"))
    reassembleExcised(df, toks, removed, textCol, idCol)
  }

  /** Span-level DECONTAMINATION: excise from every corpus document each
    * `n`-token window that also occurs in the benchmark set, emitting
    * the cleaned text — the surgical variant of [[contaminatedIds]]'s
    * drop-the-whole-document rule (the eval question is cut, the other
    * 10k tokens of the page survive).
    *
    * A token is removed iff at least one benchmark-matching window
    * covers it; overlapping matches merge as a coverage union, exactly
    * like [[removeDuplicateSpans]] (same tokenization, same
    * reassembly, same null/short-doc pass-through) — but with no
    * canonical survivor: benchmark text has NO right to exist in
    * training data, so every occurrence is cut.
    *
    * Execution shape: the benchmark side reduces to a DISTINCT window
    * list (tiny vs the corpus — eval sets are MBs against 100 TB), so
    * the window match is a semi-join-shaped inner join that AQE
    * broadcasts; the corpus is scanned once for windows and once for
    * reassembly, each behind one doc-keyed shuffle. The span string is
    * the join key at test scale; at 100 TB carry a 64-bit span hash.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String,
                         n: Int = 8): DataFrame = {
    require(n >= 1, s"span length must be positive, got $n")
    val toks = spanToks(corpus, textCol, idCol)
    val bwins = spanWindows(spanToks(benchmark, textCol, idCol), idCol, n)
      .select(col("__span")).distinct()
    val removed = spanWindows(toks, idCol, n)
      .join(bwins, Seq("__span"))
      .select(col(idCol),
        explode(sequence(col("__start"), col("__start") + n - 1))
          .as("__idx"))
      .distinct()
    reassembleExcised(corpus, toks, removed, textCol, idCol)
  }

  /** WITHIN-document line dedup (the C4 "discard all but one of any
    * three-sentence span" rule's line-level cousin, applied per doc):
    * keep the FIRST occurrence of each exact line inside a document,
    * preserve order, drop later repeats. Complements
    * [[dropRepeatedLines]], which removes CORPUS-repeated boilerplate —
    * this one kills within-page chrome (repeated nav blocks, pasted
    * paragraphs) and needs no cross-doc information at all.
    *
    * Execution shape: a pure projection — the line array is staged
    * once (HOF-CSE lesson), first-occurrence is `array_position(lines,
    * l) == own index`, and reassembly is `array_join`; ZERO shuffles,
    * so at 100 TB this is a free rider on whatever scan already reads
    * the text. Per-doc cost is O(lines²) comparisons, bounded by
    * document size, not corpus size. Null text stays null.
    */
  /** Winnowed span-overlap CANDIDATES (Schleimer et al. 2003 — the
    * MOSS fingerprinting): document pairs sharing at least one
    * winnowed k-gram fingerprint. This is [[duplicateSpans]]'
    * at-scale arm: instead of shuffling EVERY n-token window (the
    * exact diagnostic's cost), each document ships only its winnowed
    * selection — expected density 2/(w+1) of the gram set — while
    * keeping the paper's guarantee that any shared token run of
    * length ≥ w+k−1 still collides on at least one fingerprint.
    * Same posting-list shape as the MinHash banding path: explode,
    * bucket by fingerprint, `maxBucketSize` skew cap (a boilerplate
    * fingerprint shared by half the corpus generates quadratic pairs
    * and tells you nothing — cap it, and account via
    * [[winnowCandidateStats]]-style bucket counting if needed),
    * in-bucket pair expansion, distinct. Null/whitespace-only texts
    * drop (no spans to share).
    */
  def winnowCandidates(df: DataFrame, textCol: String, idCol: String,
                       k: Int = 4, w: Int = 4,
                       maxBucketSize: Int = 1000): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    val fps = df
      .filter(col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(graft.functions.NativeExpressions
          .winnowSet(col(textCol), k, w)).as("__fp"))
    val buckets = fps.groupBy(col("__fp"))
      .agg(collect_set(col(idCol)).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucketSize))
    val ids = array_sort(col("__ids"))
    buckets
      .select(explode(flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + 2, size(ids)), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Winnowed candidates CONFIRMED by exact span overlap — the
    * oracle-able relation: pairs sharing at least one distinct
    * t-token window, t = w+k−1, with the exact count of distinct
    * shared windows. By the winnowing guarantee every such pair IS a
    * candidate (a shared t-token run contains a fully shared
    * w-gram-hash window whose minimum both sides select), so — ON AN
    * UNCAPPED RUN (`maxBucketSize = Int.MaxValue`, how the gate runs
    * it) — candidates∩verify equals the semantic relation outright.
    * UNDER A FINITE CAP the equality is conditional (round-15
    * ADVICE): the candidate stage drops over-cap fingerprint buckets
    * entirely, silently losing true pairs whose only shared
    * fingerprints are boilerplate — a capped production run MUST
    * pair this with [[winnowCandidateStats]] so the dropped-bucket /
    * dropped-pair volume is reported, never read as full coverage.
    * Hash-engine-independent, fully SQL-replayable (the
    * q_d_minhash_confirmed treatment at span granularity). The
    * verify joins t-gram STRING sets (not hashes) for the candidate
    * pairs only, so a P-modulus hash collision can never perturb the
    * count; at 100 TB you'd verify on 64-bit gram hashes and accept
    * the 2⁻⁶⁴ collision odds instead.
    */
  def winnowSpanConfirmed(df: DataFrame, textCol: String, idCol: String,
                          k: Int = 4, w: Int = 4,
                          maxBucketSize: Int = 1000): DataFrame = {
    val t = w + k - 1
    val base = df
      .filter(col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      // stage the token array ONCE (HOF-CSE lesson) — same canonical
      // tokenization as duplicateSpans / the winnow kernel
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), raw"\s+"),
          x => length(x) > 0).as("__toks"))
      // t-gram strings with the kernel's short-doc semantics: a doc
      // of ≤ t tokens contributes its whole text as one gram
      .select(col(idCol),
        array_distinct(
          when(size(col("__toks")) <= t,
            array(concat_ws(" ", col("__toks"))))
          .otherwise(transform(
            sequence(lit(1), size(col("__toks")) - t + 1),
            i => concat_ws(" ", slice(col("__toks"), i, lit(t))))))
          .as("__tg"))
    val cands = winnowCandidates(df, textCol, idCol, k, w, maxBucketSize)
    cands
      .join(base.select(col(idCol).as("id_a"), col("__tg").as("__ta")),
        Seq("id_a"))
      .join(base.select(col(idCol).as("id_b"), col("__tg").as("__tb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ta"), col("__tb"))).cast("long")
          .as("n_shared"))
      .filter(col("n_shared") >= 1L)
  }

  /** Dropped-bucket accounting for [[winnowCandidates]] under the
    * same fingerprint parameters — the [[minhashCandidateStats]]
    * treatment for the winnowing path (round-15 ADVICE: a capped run
    * without this reads as full coverage). Bucket size counts
    * DISTINCT ids per fingerprint, matching the candidate stage's
    * `collect_set` semantics exactly.
    */
  def winnowCandidateStats(df: DataFrame, textCol: String, idCol: String,
                           k: Int = 4, w: Int = 4,
                           maxBucketSize: Int = 1000): LshStats = {
    require(k >= 1 && w >= 1, s"k and w must be positive: k=$k w=$w")
    val sizes = df
      .filter(col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(graft.functions.NativeExpressions
          .winnowSet(col(textCol), k, w)).as("__fp"))
      .groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("m"))
      .filter(col("m") >= 2)
    bucketStats(sizes, maxBucketSize)
  }

  def dedupLinesWithinDoc(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("text_clean",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(array_join(
            filter(col("__lines"),
              (l, i) => array_position(col("__lines"), l) === i + 1),
            "\n")))
      .drop("__lines")

  /** Canonical span tokenization: trim → lower → whitespace split,
    * empties dropped (shared by the span family so window arithmetic
    * and reassembly always agree).
    */
  private def spanToks(df: DataFrame, textCol: String,
                       idCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(split(trim(lower(col(textCol))), raw"\s+"),
          t => length(t) > 0).as("__toks"))

  /** All `n`-token windows per doc as `(idCol, __start (1-based),
    * __span)` — built from one staged token array, one pass.
    */
  private def spanWindows(toks: DataFrame, idCol: String,
                          n: Int): DataFrame =
    toks
      .select(col(idCol),
        explode(when(size(col("__toks")) >= n,
          transform(sequence(lit(1), size(col("__toks")) - n + 1),
            i => struct(i.as("start"),
              concat_ws(" ", slice(col("__toks"), i, lit(n))).as("span"))))
          .otherwise(array().cast("array<struct<start:int,span:string>>")))
          .as("w"))
      .select(col(idCol), col("w.start").as("__start"),
        col("w.span").as("__span"))

  /** Rebuild `text_clean` from the tokenization minus the removed
    * `(idCol, __idx)` positions: null text stays null, fully-excised
    * docs become the empty string.
    */
  private def reassembleExcised(df: DataFrame, toks: DataFrame,
                                removed: DataFrame, textCol: String,
                                idCol: String): DataFrame = {
    val kept = toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "__t")))
      .select(col(idCol), (col("__p") + 1).as("__idx"), col("__t"))
      .join(removed, Seq(idCol, "__idx"), "left_anti")
    val clean = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__idx"), col("__t")))),
          x => x.getField("__t")), " ").as("__clean"))
    df.select(col(idCol), col(textCol))
      .join(clean, Seq(idCol), "left")
      .select(col(idCol),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit("")))
          .as("text_clean"))
  }

  // ── MinHash ─────────────────────────────────────────────────────────

  // ONE source for the (a,b) universal-hash parameters and the prime
  // modulus: the native kernels and these declarative forms are
  // bit-identity-pinned (NativeExprSpec), so the sequence must never
  // fork
  private def hashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] =
    graft.functions.NativeExpressions.hashParams(numHashes, seed).toSeq
  private val P = graft.functions.NativeExpressions.MinHashP

  /** MinHash signature column: array<long> of length `numHashes`.
    * Shingle → 64-bit xxhash → per-function (a·x+b) mod p → min.
    *
    * Computed as ONE fold over the shingle hashes with a `zip_with`
    * against the literal (a,b) parameter array — the shingle/tokenize/
    * xxhash subtree is evaluated once per row. (The naive form — one
    * `aggregate` per hash function — duplicates that subtree
    * `numHashes` times in the plan and measured ~30× slower at sf0.1.)
    */
  def minhashSignature(textCol: Column, k: Int = 3, numHashes: Int = 32,
                       seed: Long = 42L): Column =
    minhashFromShingleHashes(
      transform(shingles(textCol, k), s => pmod(xxhash64(s), lit(P))),
      numHashes, seed)

  /** Signature from a *materialized* shingle-hash array column (the
    * staged form heavy pipelines use — see shinglesFromTokens note).
    */
  def minhashFromShingleHashes(sh: Column, numHashes: Int = 32,
                               seed: Long = 42L): Column = {
    val ab = typedlit(hashParams(numHashes, seed).map {
      case (a, b) => (a, b)
    })
    aggregate(sh,
      array_repeat(lit(Long.MaxValue), numHashes),
      // inner pmod(x, P) mirrors the native kernel's defensive mod:
      // identity for sanctioned (already-reduced) inputs, overflow-safe
      // for callers who pass raw 64-bit hashes
      (acc, x) => zip_with(acc, ab,
        (m, p) => least(m, pmod(pmod(x, lit(P)) * p.getField("_1")
          + p.getField("_2"), lit(P)))))
  }

  /** (id, sig) per row — the native-kernel path (one tight loop per
    * row; see NativeExpressions). Value-identical to the declarative
    * staged pipeline, which DedupSpec cross-validates.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, numHashes: Int = 32,
                        seed: Long = 42L): DataFrame =
    df.select(col(idCol),
      graft.functions.NativeExpressions
        .minhashSignature(col(textCol), k, numHashes, seed).as("sig"))

  /** The declarative staged form (kept as the cross-validation oracle
    * for the native kernel): tokens → shingles → hashes → signature,
    * each in its own projection so no lambda re-evaluates an expensive
    * subtree per element.
    */
  def minhashSignaturesDeclarative(df: DataFrame, textCol: String,
                                   idCol: String, k: Int = 3,
                                   numHashes: Int = 32,
                                   seed: Long = 42L): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesFromTokens(col("__toks"), k).as("__sh"))
      .select(col(idCol),
        transform(col("__sh"), s => pmod(xxhash64(s), lit(P))).as("__shh"))
      .select(col(idCol),
        minhashFromShingleHashes(col("__shh"), numHashes, seed).as("sig"))

  /** LSH banding: signature → (band_id, bucket_hash) pairs. Docs
    * sharing any band bucket are candidate near-dups; Jaccard ≥ t
    * surfaces with probability 1-(1-t^r)^b for r rows/band, b bands.
    */
  def lshBuckets(sigCol: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sigCol, b * rows + 1, lit(rows))).as("bucket")))

  /** Candidate near-dup pairs via MinHash+LSH. Output:
    * (id_a, id_b, jaccard_est) with id_a < id_b, deduped across bands.
    *
    * Execution shape (100 TB-minded): ONE shuffle — groupBy
    * (band, bucket) with collect_list of (id, signature) — then pairs
    * are generated inside each bucket with array lambdas. No self-join
    * (which would duplicate the whole signature pipeline on both join
    * sides), no window (which would add a sort). A bucket's member
    * list is bounded by `maxBucketSize`, so collect_list state is
    * bounded too.
    *
    * @param maxBucketSize skew guard: buckets larger than this are
    *        dropped (a bucket of m docs contributes m² pairs — the
    *        same cap production dedup pipelines put on posting lists).
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, numHashes: Int = 32, bands: Int = 8,
                        maxBucketSize: Int = 1000,
                        includeEstimate: Boolean = true): DataFrame =
    candidatesFromSignatures(
      minhashSignatures(df, textCol, idCol, k, numHashes),
      idCol, numHashes, bands, maxBucketSize, includeEstimate)

  /** Candidate pairs from a precomputed `(idCol, sig)` table — the
    * entry point for pipelines that already hold signatures
    * ([[withNearDupPairs]] derives them from stored shingle sets so the
    * corpus is tokenized exactly once).
    */
  def candidatesFromSignatures(withSig: DataFrame, idCol: String,
                               numHashes: Int = 32, bands: Int = 8,
                               maxBucketSize: Int = 1000,
                               includeEstimate: Boolean = true): DataFrame = {
    // silent truncation (bands∤numHashes) skews the detection curve;
    // bands > numHashes degenerates to ONE global bucket that the skew
    // cap then drops — an empty result with no error
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // when the caller verifies with exact Jaccard anyway (nearDupPairs),
    // skip the estimate: the shuffle then carries (band, bucket, id)
    // alone — 16 bytes/row instead of id + the full signature
    val member =
      if (includeEstimate) struct(col(idCol).as("id"), col("sig"))
      else struct(col(idCol).as("id"))
    val exploded = withSig
      .select(col(idCol), col("sig"),
        explode(lshBuckets(col("sig"), bands, rows)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        member.as("m"))
    val buckets = exploded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")).between(2, maxBucketSize))
    val ms = array_sort(col("ms")) // by id → deterministic id_a < id_b
    val pairExpr =
      if (includeEstimate)
        flatten(transform(ms, (x, i) =>
          transform(slice(ms, i + 2, size(ms)), y =>
            struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
              (aggregate(zip_with(x.getField("sig"), y.getField("sig"),
                (p, q) => when(p === q, 1L).otherwise(0L)),
                lit(0L), (acc, v) => acc + v)
                .cast("double") / numHashes).as("jaccard_est")))))
      else
        flatten(transform(ms, (x, i) =>
          transform(slice(ms, i + 2, size(ms)), y =>
            struct(x.getField("id").as("id_a"), y.getField("id").as("id_b")))))
    val cols =
      if (includeEstimate) Seq(col("p.id_a"), col("p.id_b"), col("p.jaccard_est"))
      else Seq(col("p.id_a"), col("p.id_b"))
    buckets.select(explode(pairExpr).as("p"))
      .select(cols: _*)
      .distinct()
  }

  /** What a `maxBucketSize` cap would silently skip. `buckets` counts
    * multi-member buckets (the ones that generate pairs),
    * `droppedBuckets`/`droppedPairs` the ones past the cap and the
    * m·(m−1)/2 pairs they would have produced. Production dedup must
    * report this: silent truncation reads as full coverage. One extra
    * bucket-size aggregation (counts only — no member lists), one
    * single-row driver round-trip.
    */
  final case class LshStats(buckets: Long, droppedBuckets: Long,
                            droppedPairs: Long)

  /** Dropped-bucket accounting for [[minhashCandidates]] under the
    * same banding parameters.
    */
  def minhashCandidateStats(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 3, numHashes: Int = 32, bands: Int = 8,
                            maxBucketSize: Int = 1000): LshStats = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val sizes = minhashSignatures(df, textCol, idCol, k, numHashes)
      .select(explode(lshBuckets(col("sig"), bands, rows)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bucket"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= 2)
    bucketStats(sizes, maxBucketSize)
  }

  /** Shared tail of the two LSH stats paths: (…, m) bucket sizes →
    * totals. Exact long arithmetic (`div 2` on an even product), no
    * doubles.
    */
  private[operators] def bucketStats(sizes: DataFrame,
                                     maxBucketSize: Int): LshStats = {
    val r = sizes.agg(
      count(lit(1)).as("buckets"),
      sum(when(col("m") > maxBucketSize, 1L).otherwise(0L)).as("dropped"),
      sum(when(col("m") > maxBucketSize,
        expr("m * (m - 1) div 2")).otherwise(0L)).as("dropped_pairs"))
      .collect()(0)
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    LshStats(l(0), l(1), l(2))
  }

  /** Jaccard from two *materialized* distinct-shingle-set columns. */
  def jaccardFromSets(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Exact n-gram Jaccard between two text columns (convenience form;
    * heavy pipelines stage shingle sets first — see shinglesFromTokens).
    */
  def jaccard(a: Column, b: Column, k: Int = 3): Column =
    jaccardFromSets(array_distinct(shingles(a, k)),
      array_distinct(shingles(b, k)))

  /** (id, shingle-set) per row, staged. */
  def shingleSets(df: DataFrame, textCol: String, idCol: String,
                  k: Int = 3): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shinglesFromTokens(col("__toks"), k).as("__sh"))
      .select(col(idCol), array_distinct(col("__sh")).as("shingle_set"))

  /** MinHash+LSH candidates verified with exact Jaccard ≥ threshold.
    * The join back to text touches only candidate ids — at scale this
    * is two broadcast-able joins against a pair list that is orders of
    * magnitude smaller than the corpus.
    *
    * The result is materialized through a scratch parquet before
    * return (see [[Materialize]]): the operator persists two
    * multi-consumer intermediates for the duration of the computation
    * and unpersists BOTH before returning, so repeated invocations in
    * a long-lived session leave no cached blocks behind
    * (CacheHygieneSpec pins `getPersistentRDDs.isEmpty`). Callers who
    * want to stay lazy use [[withNearDupPairs]] directly.
    */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double, k: Int = 3): DataFrame =
    withNearDupPairs(df, textCol, idCol, threshold, k)(
      Materialize.viaScratch(_, "graft-neardup"))

  /** Bracket form of [[nearDupPairs]]: builds the verified-pair plan
    * with its intermediates persisted, passes it to `f` (which must
    * run whatever actions it needs), and unpersists in try/finally.
    *
    * ONE kernel pass over the corpus: tokenize → shingle → hash →
    * sorted distinct set ([[graft.functions.NativeExpressions.ShingleHashSet]]),
    * persisted because BOTH downstream consumers read it — the MinHash
    * signature is derived from the stored set (bit-identical to
    * hashing the raw text: a duplicate shingle can never change a
    * minimum — NativeExprSpec pins it), and exact-Jaccard verification
    * joins the same sets back on candidate ids. Round 4 ran the
    * dominant string-processing kernel twice (MinHashSig over the full
    * corpus + a second ShingleHashSet pass for verification); deriving
    * the signature from the set makes the second "pass" pure integer
    * folds. The persisted set column is the operator's peak storage
    * (≈ the tokenized corpus, spilling to disk) — the same trade a
    * production dedup run makes when it stores signatures instead of
    * re-reading documents.
    *
    * Why the persists exist: the set table feeds the banding path and
    * both sides of the verification join; the candidate pair list
    * feeds the id semi-join and the final join. `Dataset.persist`
    * registers the plan in the session's CacheManager, which holds it
    * until an explicit `unpersist()` — so the bracket, not GC, is what
    * guarantees a long-lived session doesn't accumulate dead cache
    * entries.
    */
  def withNearDupPairs[T](df: DataFrame, textCol: String, idCol: String,
                          threshold: Double, k: Int = 3)
                         (f: DataFrame => T): T = {
    import graft.functions.NativeExpressions.{minhashFromHashes, shingleHashSet, sortedJaccard}
    val allSets = df
      .select(col(idCol), shingleHashSet(col(textCol), k).as("shingle_set"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = allSets.select(col(idCol),
      minhashFromHashes(col("shingle_set")).as("sig"))
    val cands = candidatesFromSignatures(sigs, idCol,
      includeEstimate = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // verification joins ONLY candidate docs' sets: semi-join the set
    // table down to candidate ids first — at corpus scale candidates
    // are a small fraction of rows. No distinct: a left-semi probe
    // side needs no dedup, so the explode feeds the join directly
    // (one shuffle fewer).
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as(idCol))
    // verify on sorted shingle-hash sets: 8 bytes/shingle through the
    // join instead of shingle text, Jaccard as a linear merge walk
    // (hash collisions mod 1e9+7 shift Jaccard by < 1e-4 — the same
    // tolerance every production MinHash verifier accepts)
    // no broadcast hint: AQE broadcasts the id list when it is small
    // (the usual case) and falls back to a shuffled semi-join when a
    // pathological corpus yields candidate lists past the threshold.
    val sets = allSets.join(candIds, Seq(idCol), "left_semi")
    try {
      val sa = sets.select(col(idCol).as("id_a"), col("shingle_set").as("set_a"))
      val sb = sets.select(col(idCol).as("id_b"), col("shingle_set").as("set_b"))
      f(cands.join(sa, "id_a").join(sb, "id_b")
        .select(col("id_a"), col("id_b"),
          sortedJaccard(col("set_a"), col("set_b")).as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard")))
    } finally {
      allSets.unpersist(blocking = false)
      cands.unpersist(blocking = false)
    }
  }

  // ── Incremental dedup against a persisted signature index ───────────
  // The nightly-ingest shape: a 100 TB corpus is tokenized exactly once
  // — the night each document arrives — and every later batch dedups
  // against STORED signatures, never against re-read text. The index is
  // an append-mode VersionedTable of (id, shingle_set, sig) rows: the
  // signature drives LSH banding, the sorted shingle-hash set makes
  // exact Jaccard verification of future increments possible without
  // touching this batch's text again.

  /** Signature-parameter fingerprint baked into a persisted index.
    * Signatures hashed under different shingle sizes / hash counts /
    * seeds can never be compared — a mismatch must fail loudly, never
    * silently mix.
    */
  private def sigIndexParams(k: Int, numHashes: Int, seed: Long): String =
    s"minhash-shingleset:k=$k,numHashes=$numHashes,seed=$seed"

  /** Record the fingerprint at index creation (atomic create-if-absent,
    * the [[graft.engine.VersionedTable]] mode-marker protocol: only a
    * LOST RACE may be swallowed — a genuine IO failure must surface or
    * the guard is disabled for the index's whole life) and check it on
    * every later access.
    */
  private def ensureSigIndexParams(spark: org.apache.spark.sql.SparkSession,
                                   indexPath: String, fp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_SIG_PARAMS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def read(): Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](128)
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
          Some(out.toString("UTF-8").trim).filter(_.nonEmpty)
        } finally in.close()
      }
    def check(have: String): Unit = require(have == fp,
      s"signature index at $indexPath holds '$have' but the caller " +
        s"wants '$fp' — signatures under different parameters can " +
        "never be compared; use a fresh index path")
    read() match {
      case Some(have) => check(have)
      case None =>
        fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath))
        val won =
          try { val o = fs.create(p, false)
                o.write(fp.getBytes("UTF-8")); o.close(); true }
          catch {
            case e: java.io.IOException =>
              if (!fs.exists(p)) throw e
              false
          }
        if (!won) read().foreach(check)
    }
  }

  /** Sign `df` and commit it to the index at `indexPath` as batch
    * `batchId` — the bootstrap/append half of the incremental-dedup
    * protocol. Atomic and idempotent via
    * [[graft.engine.VersionedTable.commitBatch]]: a replay of an
    * already-committed batch writes nothing and returns false. Ids must
    * be unique across all increments of one index (they are the join
    * key verification and resolution run on).
    */
  def appendSignatures(df: DataFrame, textCol: String, idCol: String,
                       indexPath: String, batchId: Long, k: Int = 3,
                       numHashes: Int = 32, seed: Long = 42L): Boolean = {
    import graft.functions.NativeExpressions.{minhashFromHashes, shingleHashSet}
    val spark = df.sparkSession
    ensureSigIndexParams(spark, indexPath, sigIndexParams(k, numHashes, seed))
    val vt = new graft.engine.VersionedTable(spark, s"$indexPath/sigs")
    // set staged first, signature DERIVED from the stored set (pure
    // integer folds — bit-identical to hashing the raw text, pinned in
    // NativeExprSpec): the text kernel runs exactly once per document,
    // at the write that persists it
    vt.commitBatch(batchId,
      df.select(col(idCol).as("id"),
          shingleHashSet(col(textCol), k).as("shingle_set"))
        .select(col("id"), col("shingle_set"),
          minhashFromHashes(col("shingle_set"), numHashes, seed).as("sig")))
  }

  /** Near-duplicate pairs involving a NEW batch, against everything
    * already in a persisted signature index — commits the increment,
    * then reports exactly the pairs with at least one member in it
    * (old×old pairs were reported the night they formed, so the union
    * of every increment's output equals a full recompute — DedupSpec
    * pins it).
    *
    * Protocol (crash-safe, replay-deterministic):
    *  1. [[appendSignatures]] commits the increment as generation
    *     `batchId` (atomic, idempotent);
    *  2. both join sides read back from the STORE — the just-committed
    *     generation and the `< batchId` snapshot
    *     ([[graft.engine.VersionedTable.readThrough]]), so a replay
    *     after later appends still compares against exactly the corpus
    *     state this batch arrived into, and the text kernels never run
    *     twice;
    *  3. LSH-band both sides; OLD band rows are semi-join-pruned to
    *     buckets containing at least one new member before the bucket
    *     groupBy (an untouched bucket cannot form a new pair — the
    *     nightly full-index cost is a pruned columnar scan of stored
    *     signatures, not a re-tokenization). Retained buckets keep
    *     their full old∪new membership, so `maxBucketSize` means
    *     exactly what it means in [[candidatesFromSignatures]];
    *  4. pairs keep only ≥1-new members; exact verification joins the
    *     stored shingle sets of candidate ids only (semi-join first,
    *     like [[withNearDupPairs]]).
    *
    * Output: (id_a, id_b, jaccard ≥ threshold), id_a < id_b,
    * materialized through scratch before return (same cache hygiene as
    * [[nearDupPairs]]; the one persisted intermediate — the candidate
    * pair list — is unpersisted in finally).
    */
  def incrementalNearDups(newDocs: DataFrame, textCol: String,
                          idCol: String, indexPath: String, batchId: Long,
                          threshold: Double, k: Int = 3,
                          numHashes: Int = 32, seed: Long = 42L,
                          bands: Int = 8,
                          maxBucketSize: Int = 1000): DataFrame = {
    import graft.functions.NativeExpressions.sortedJaccard
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val spark = newDocs.sparkSession
    appendSignatures(newDocs, textCol, idCol, indexPath, batchId,
      k, numHashes, seed)
    val vt = new graft.engine.VersionedTable(spark, s"$indexPath/sigs")
    def toBands(sig: DataFrame, isNew: Boolean): DataFrame = sig
      .select(col("id"),
        explode(lshBuckets(col("sig"), bands, rowsPerBand)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), lit(isNew).as("is_new"))
    val newBands = toBands(vt.readVersion(batchId), isNew = true)
    val oldVersions = vt.versions.filter(_ < batchId)
    val combined =
      if (oldVersions.isEmpty) newBands
      else {
        // prune the (huge) old side to touched buckets; the new side's
        // distinct key list is one night of ingest — AQE broadcasts it
        val newKeys = newBands.select(col("band"), col("bucket")).distinct()
        toBands(vt.readThrough(batchId - 1), isNew = false)
          .join(newKeys, Seq("band", "bucket"), "left_semi")
          .unionByName(newBands)
      }
    val ms = array_sort(col("ms")) // by id → deterministic id_a < id_b
    val pairExpr = flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + 2, size(ms)), y =>
        struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
          (x.getField("is_new") || y.getField("is_new")).as("any_new")))))
    val cands = combined.groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("id"), col("is_new"))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucketSize))
      .select(explode(pairExpr).as("p"))
      .filter(col("p.any_new"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val candIds = cands
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      val sets = vt.readThrough(batchId)
        .select(col("id"), col("shingle_set"))
        .join(candIds, Seq("id"), "left_semi")
      val sa = sets.select(col("id").as("id_a"), col("shingle_set").as("set_a"))
      val sb = sets.select(col("id").as("id_b"), col("shingle_set").as("set_b"))
      Materialize.viaScratch(
        cands.join(sa, "id_a").join(sb, "id_b")
          .select(col("id_a"), col("id_b"),
            sortedJaccard(col("set_a"), col("set_b")).as("jaccard"))
          .filter(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard")),
        "graft-incdedup")
    } finally cands.unpersist(blocking = false)
  }

  /** Maintenance for [[incrementalNearDups]]'s signature index: fold
    * every per-batch generation ≤ `upTo` into one size-targeted
    * generation and retire `retiredIds`' signatures (documents deleted
    * from the corpus must stop matching future increments — their
    * shingle sets are dead weight in every band join). At daily
    * increments the unbounded ledger is thousands of small files
    * within a quarter; this is the nightly OPTIMIZE that keeps the
    * old-side scan columnar and few-file.
    *
    * Exactness contract (DedupSpec): for any later batch, the
    * candidate set and verified pairs computed against the compacted
    * index equal those against the uncompacted one minus pairs
    * involving retired ids — the squash preserves (id, shingle_set,
    * sig) rows verbatim, and banding is a pure function of `sig`.
    * Replays of batches ≤ `upTo − 1` read "already committed"; pick
    * `upTo` at the streaming checkpoint's committed horizon.
    */
  def compactSignatureIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, upTo: Long = -1L,
                            retiredIds: Option[DataFrame] = None,
                            targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val vt = new graft.engine.VersionedTable(spark, s"$indexPath/sigs")
    val n = if (upTo < 0) vt.latestVersion.getOrElse(
      throw new IllegalStateException(s"no signature index at $indexPath"))
    else upTo
    val keep = retiredIds.map { r => (df: DataFrame) =>
      df.join(r.select(col(r.columns.head).as("id")).distinct(),
        Seq("id"), "left_anti")
    }
    vt.compactAppend(n, targetFileBytes, keep)
  }

  // ── Benchmark decontamination ───────────────────────────────────────

  /** Ids of corpus documents sharing at least one word-k-shingle with
    * the benchmark set — the train/test contamination check a
    * training-data pipeline runs before release (an eval document
    * whose shingles leak into the corpus inflates benchmark scores).
    *
    * Execution shape: shingle HASHES (8 bytes each, from the same
    * [[graft.functions.NativeExpressions.ShingleHashSet]] kernel the
    * dedup pipeline uses) explode on both sides and meet in a semi-join
    * keyed on the hash — the corpus never shuffles text, and the
    * benchmark side (eval sets are thousands of documents, not
    * billions) deduplicates to a distinct hash list that AQE
    * broadcasts. The id distinct is the only corpus-keyed shuffle and
    * carries bare ids.
    */
  /** @param minShared contamination threshold: a doc is flagged when
    *        it shares at least this many DISTINCT shingles with the
    *        benchmark (production decontamination uses an overlap
    *        threshold, not any-hit, to tolerate one generic phrase;
    *        the per-doc shingle column is already a set, so the count
    *        after the hash join is exactly the distinct overlap).
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
                      textCol: String, idCol: String,
                      k: Int = 3, minShared: Int = 1): DataFrame = {
    import graft.functions.NativeExpressions.shingleHashSet
    require(minShared >= 1, "minShared must be at least 1")
    val bsh = benchmark
      .select(explode(shingleHashSet(col(textCol), k)).as("__sh"))
      .distinct()
    corpus
      .select(col(idCol), explode(shingleHashSet(col(textCol), k)).as("__sh"))
      .join(bsh, Seq("__sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") >= minShared)
      .select(col(idCol))
  }

  /** Per-document contamination FRACTION against a benchmark set —
    * the graded variant of [[contaminatedIds]]'s any-hit test (the
    * GPT-3 appendix-C shape: a document is contaminated when the
    * fraction of its n-grams that appear in any eval set crosses a
    * threshold, so one generic phrase doesn't nuke a long document
    * while a short quote of an eval question still trips).
    *
    * Emits `(idCol, n_shingles, n_hit, contaminated)` for EVERY corpus
    * document (zero-shingle docs report 0/0, not-contaminated). The
    * threshold compares in exact integer arithmetic
    * (`n_hit * fracDen >= n_shingles * fracNum` ⇔ hit fraction ≥
    * fracNum/fracDen) — no float boundary for engines to disagree on.
    *
    * Execution shape: same as [[contaminatedIds]] — 8-byte shingle
    * hashes explode on both sides, the benchmark side deduplicates to
    * a distinct list that AQE broadcasts, and the one corpus-keyed
    * shuffle carries (id, hit-flag) pairs, never text. The per-doc
    * totals ride the same aggregate (count + conditional count), so
    * the graded report costs exactly the any-hit relation.
    */
  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, k: Int = 3,
                         fracNum: Int = 1, fracDen: Int = 5): DataFrame = {
    import graft.functions.NativeExpressions.shingleHashSet
    require(fracNum >= 1 && fracDen >= fracNum,
      s"threshold must be a fraction in (0,1], got $fracNum/$fracDen")
    val bsh = benchmark
      .select(explode(shingleHashSet(col(textCol), k)).as("__sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(col(idCol), explode_outer(shingleHashSet(col(textCol), k))
        .as("__sh"))
      .join(bsh, Seq("__sh"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("__sh")).as("n_shingles"),
        count(col("__hit")).as("n_hit"))
      .select(col(idCol), col("n_shingles"), col("n_hit"),
        (col("n_hit") * fracDen >= col("n_shingles") * fracNum &&
          col("n_shingles") > 0).as("contaminated"))
  }

  /** Corpus minus contaminated documents — an anti join against the
    * (small) contaminated-id list.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String, k: Int = 3,
                    minShared: Int = 1): DataFrame =
    corpus.join(
      contaminatedIds(corpus, benchmark, textCol, idCol, k, minShared),
      Seq(idCol), "left_anti")

  /** [[contaminatedIds]] with a broadcast Bloom prefilter on the corpus
    * side — the 100 TB shape. The exact semi-join above shuffles EVERY
    * corpus (shingle, id) row toward the benchmark set; here a Bloom
    * sketch of the benchmark shingles (bounded: benchmarks are small
    * by construction) is broadcast and applied AT THE SCAN, so only
    * true hits plus an fpp-fraction of false positives enter the
    * exchange. The exact semi-join still runs on the survivors —
    * Bloom filters have no false negatives, so prefilter → exact
    * verify is EXACTLY the unfiltered relation (DedupSpec pins
    * bloom ≡ exact on planted contamination).
    */
  def contaminatedIdsBloom(corpus: DataFrame, benchmark: DataFrame,
                           textCol: String, idCol: String,
                           k: Int = 3, minShared: Int = 1,
                           fpp: Double = 0.01): DataFrame = {
    import graft.functions.NativeExpressions.shingleHashSet
    require(minShared >= 1, "minShared must be at least 1")
    val spark = corpus.sparkSession
    // materialized once: three consumers (sizing count, sketch build,
    // exact-verify semi-join) would otherwise each re-run the
    // shingle-explode-distinct plan — the scratch scan replaces three
    // evaluations with one write of the small benchmark side
    val bsh = Materialize.viaScratch(
      benchmark
        .select(explode(shingleHashSet(col(textCol), k)).as("__sh"))
        .distinct(),
      "bloom-bench-shingles")
    // sketch sizing needs a cardinality: one cheap count over the
    // (small) benchmark shingle set, the same bounded-side job a
    // broadcast-join size estimate performs
    val nBench = math.max(1L, bsh.count())
    // one caller-managed broadcast for the sketch (not a per-plan
    // convenience broadcast): REUSED if the returned plan executes
    // more than once, reclaimable by the ContextCleaner when the plan
    // is dropped
    val bc = Bloom.broadcastSketch(spark, Bloom.build(bsh, "__sh", nBench, fpp))
    corpus
      .select(col(idCol), explode(shingleHashSet(col(textCol), k)).as("__sh"))
      .filter(Bloom.mightContain(col("__sh"), bc))
      .join(bsh, Seq("__sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") >= minShared)
      .select(col(idCol))
  }

  /** [[decontaminate]] through the Bloom-prefiltered id list. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, k: Int = 3,
                         minShared: Int = 1, fpp: Double = 0.01): DataFrame =
    corpus.join(
      contaminatedIdsBloom(corpus, benchmark, textCol, idCol, k, minShared,
        fpp),
      Seq(idCol), "left_anti")

  // ── Dedup resolution (connected components) ─────────────────────────

  /** Connected components over an undirected pair list — the dedup
    * RESOLUTION step: near-dup pairs partition the corpus into groups
    * and each group keeps one canonical row. Output: (id, component)
    * for every id appearing in a pair, where component = the smallest
    * id reachable through any chain of pairs (deterministic).
    *
    * Execution shape: iterative min-label propagation with path
    * halving — per iteration,
    * `label(v) ← min(label(v), min over neighbors' labels,
    * label(label(v)))` — which is two hash joins + one aggregation on
    * (id, label) pairs, never the documents. The label(label(v)) hop
    * is the pointer-jumping trick that makes long chains converge in
    * O(log diameter) rounds instead of O(diameter) (the same idea
    * large-star/small-star CC uses at planetary scale). Convergence
    * is a changed-label count per round: one scalar driver round-trip,
    * the same bounded category as the reference's max-key collect.
    *
    * Every round MATERIALIZES the new label table through scratch
    * parquet ([[Materialize]]) instead of persist(): an iterative
    * DataFrame references its predecessor three times per round, so
    * the un-truncated logical plan grows 3^rounds and OOMs the driver
    * around round 15 (measured) — per-round checkpointing is how
    * every production iterative-graph implementation on Spark bounds
    * lineage, and it leaves zero cache residue as a side effect.
    *
    * Hybrid execution: when the pair list is small enough to hold on
    * the driver (`maxLocalEdges`, default 2²⁰ pairs ≈ tens of MB), a
    * local union-find answers in one collect — below that size the
    * iterative path's fixed per-round costs (scratch write + read +
    * 2 joins, times O(log diameter) rounds) exceed the actual work by
    * orders of magnitude. This is the same bounded-input decision a
    * broadcast threshold encodes; the cutover is an explicit parameter,
    * the result is identical (DedupSpec pins both paths equal on the
    * same graphs), and the iterative path remains the default the
    * moment the pair list outgrows the bound. The fast path applies to
    * LONG ids only (the engine's id convention) — any other id type
    * (strings, composites) always takes the type-generic iterative
    * path. A near-dup pair list at 100 TB (billions of pairs) always
    * takes the iterative path.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxIters: Int = 25,
                          maxLocalEdges: Long = 1L << 20): DataFrame = {
    // a null endpoint can't link components — drop those edges up
    // front so BOTH execution paths see the same graph
    val cleanPairs = pairs
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("src"), col(bCol).as("dst"))
    // the local fast path only claims long ids (the engine's id
    // convention); any other id type — strings, composites — keeps the
    // type-generic iterative path, which orders labels via min/least
    val bothLong = Seq(aCol, bCol).forall(c =>
      pairs.schema(pairs.schema.fieldIndex(c)).dataType ==
        org.apache.spark.sql.types.LongType)
    if (maxLocalEdges > 0 && bothLong) {
      // ONE probe doubles as the data fetch: take maxLocalEdges+1 rows —
      // if fewer came back we already hold the whole edge list and the
      // local path pays no second evaluation of the pair plan
      val cap = math.min(maxLocalEdges, (Int.MaxValue - 1).toLong).toInt
      val probe = cleanPairs.limit(cap + 1).collect()
      if (probe.length <= cap)
        return localComponents(pairs.sparkSession, probe)
    }
    val (edges, edgesScratch) = Materialize.viaScratchWithPath(
      cleanPairs.union(cleanPairs.select(col("dst").as("src"),
        col("src").as("dst"))),
      "graft-cc-edges")
    val (labels0, labels0Scratch) = Materialize.viaScratchWithPath(
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")),
      "graft-cc-labels")
    var labels = labels0
    // one propagate+halve application: (id, label, orig) → same shape.
    // The pointer-jumping hop label(label(v)) is folded INTO the
    // neighbor-min join by unioning the reversed pointer edges
    // (label(v) → v) with the graph edges: v then "hears" label(v)'s
    // label through the same groupBy(dst) min as its real neighbors —
    // 2 joins + 1 aggregation per application instead of the 3 joins
    // the separate self-join hop needed (each join is a fixed-cost
    // stage in an iterative loop, so fewer stages per round is the
    // lever on the per-round constant). A v with label(v)=v adds the
    // self-edge (v,v), contributing its own label — absorbed by
    // least(). least() skips nulls (isolated vertices); `orig` (the
    // round-start label) rides along so convergence detection is a
    // column comparison in the materialized table, not a join against
    // the previous round.
    def step(l: DataFrame): DataFrame = {
      val aug = edges.unionByName(
        l.select(col("label").as("src"), col("id").as("dst")))
      val nbrMin = aug.join(l, aug("src") === l("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr"))
      l.join(nbrMin, l("id") === nbrMin("dst"), "left")
        .select(l("id"),
          least(l("label"), col("nbr")).as("label"),
          l("orig"))
    }
    var converged = false
    var it = 0
    var prev: Option[Materialize.Scratch] = Some(labels0Scratch)
    while (!converged && it < maxIters) {
      // TWO applications per materialized round: labels only ever
      // decrease, so comparing the doubled step against the round
      // start still detects the fixpoint exactly — and the scratch
      // write/read cycle (the per-round fixed cost) is paid half as
      // often for the same total propagation depth. The changed-label
      // count piggybacks on the write action as an observed metric
      // (CollectMetrics): one action per round, no second job to
      // re-read the table just to count, and the scratch holds only
      // (id, label).
      val doubled = step(step(labels.withColumn("orig", col("label"))))
      val obs = org.apache.spark.sql.Observation()
      val (next, scratch) = Materialize.viaScratchWithPath(
        doubled
          .observe(obs, sum(when(col("label") =!= col("orig"), 1L)
            .otherwise(0L)).as("n_changed"))
          .select(col("id"), col("label")),
        "graft-cc-labels")
      // sum over an empty table observes null → 0 changed
      val changed = obs.get.get("n_changed").flatMap(Option(_))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      // the superseded round's table is fully consumed (the new round
      // is on disk and counted) — drop its scratch now, not at exit
      prev.foreach(_.drop())
      prev = Some(scratch)
      labels = next
      converged = changed == 0
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "component diameter exceeds 2^maxIters; raise maxIters")
    edgesScratch.drop() // final labels are edge-independent
    labels.select(col("id"), col("label").as("component"))
  }

  /** Driver-local union-find over a collected edge list (the bounded
    * fast path of [[connectedComponents]], long ids only): union-by-
    * min-root + path compression, so every set's root IS its smallest
    * member — identical output to the iterative path's min-label
    * fixpoint (null edges were dropped before either path).
    */
  private def localComponents(spark: org.apache.spark.sql.SparkSession,
                              edges: Array[org.apache.spark.sql.Row])
      : DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression: point the walked chain at the root
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { e =>
      val a = e.getLong(0)
      val b = e.getLong(1)
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    parent.keysIterator.map(id => (id, find(id))).toSeq
      .toDF("id", "component")
  }

  /** Keep one canonical row per near-dup group (the smallest id) and
    * every row not implicated in any pair — the standard "drop the
    * dupes" tail of a dedup pipeline. The join against the corpus is
    * an anti join on the (small) non-canonical id list.
    */
  def resolveDuplicates(df: DataFrame, pairs: DataFrame,
                        idCol: String): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  // ── SimHash ─────────────────────────────────────────────────────────

  /** 64-bit SimHash of the token set, via built-in expressions: for
    * each bit position, sum +1/-1 over token hashes and take the sign.
    * Near-dups differ in few bits (small Hamming distance).
    *
    * Single fold: the per-bit counters live in one array accumulator so
    * token hashes are computed once per row (see minhashSignature).
    */
  def simhash(textCol: Column, bits: Int = 64): Column =
    simhashFromTokenHashes(transform(tokens(textCol), t => xxhash64(t)), bits)

  /** SimHash from a materialized token-hash array column (staged form). */
  def simhashFromTokenHashes(th: Column, bits: Int = 64): Column = {
    val masks = typedlit((0 until bits).map(1L << _))
    val counts = aggregate(th,
      array_repeat(lit(0L), bits),
      (acc, h) => zip_with(acc, masks,
        (c, m) => c + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    val packed = zip_with(counts, masks,
      (c, m) => when(c > 0L, m).otherwise(lit(0L)))
    aggregate(packed, lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** SimHash near-dup candidates, blocked on the 4 × 16-bit words of
    * the 64-bit hash (Manku et al., WWW'07 shape): by pigeonhole, docs
    * within Hamming distance < 4 share at least one identical word, so
    * blocking finds them without all-pairs comparison — and a 16-bit
    * block keeps random collisions at 1/65536 (an 8-bit block floods
    * the bucket join with n²/256 accidental pairs at n=10k; measured
    * 780k junk pairs). Output (id_a, id_b, hamming).
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3,
                        maxBucketSize: Int = 1000): DataFrame = {
    val blocks = 4 // 4 × 16-bit words of the 64-bit simhash
    // pigeonhole only guarantees a shared block for distance < blocks;
    // a larger maxHamming would SILENTLY miss pairs whose differing
    // bits spread across all four words
    require(maxHamming < blocks,
      s"maxHamming ($maxHamming) must be < $blocks for 4×16-bit blocking " +
        "to guarantee candidate recall")
    hammingCandidates(
      df.select(col(idCol),
        graft.functions.NativeExpressions.simhash(col(textCol)).as("sh")),
      "sh", idCol, maxHamming, maxBucketSize)
  }

  /** The Manku 4×16-bit blocking over ANY precomputed 64-bit
    * signature column — shared by text SimHash ([[simhashCandidates]])
    * and image perceptual hashes
    * ([[Multimodal.imageNearDupCandidates]]); the signature's
    * provenance is irrelevant to the pigeonhole argument.
    */
  def hammingCandidates(signed: DataFrame, sigCol: String, idCol: String,
                        maxHamming: Int = 3,
                        maxBucketSize: Int = 1000): DataFrame = {
    val blocks = 4
    require(maxHamming < blocks,
      s"maxHamming ($maxHamming) must be < $blocks for 4×16-bit blocking " +
        "to guarantee candidate recall")
    val exploded = signed
      .select(col(idCol), col(sigCol).as("sh"),
        explode(sequence(lit(0), lit(blocks - 1))).as("blk"))
      .select(col("blk"), expr("(sh >> (blk * 16)) & 65535").as("blkv"),
        struct(col(idCol).as("id"), col("sh")).as("m"))
    val buckets = exploded.groupBy(col("blk"), col("blkv"))
      .agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")).between(2, maxBucketSize))
    val ms = array_sort(col("ms"))
    val pairs = flatten(transform(ms, (x, i) =>
      transform(slice(ms, i + 2, size(ms)), y =>
        struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
          bit_count(x.getField("sh").bitwiseXOR(y.getField("sh")))
            .as("hamming")))))
    buckets.select(explode(pairs).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .filter(col("hamming") <= maxHamming) // before distinct: the
      // hamming cut drops the bulk of bucket-collision pairs, so the
      // dedup shuffle only carries survivors
      .distinct()
  }
}
