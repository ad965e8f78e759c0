package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, expressed as
  * codegen'd built-in expressions (no UDFs): tokenization, token
  * counting, quality scoring, language-ID, shingling, fingerprinting.
  *
  * Every function here is a pure `Column` transform — Catalyst can
  * push/prune/fuse them, and they vectorize inside whole-stage codegen
  * at 100 TB without a serialization boundary.
  */
object TextFunctions {

  /** Whitespace tokens of lower-cased text; empty string → empty array
    * (Spark's split("") yields [""] — we filter it).
    */
  def tokens(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  // CJK Unified Ideographs (BMP block — UTF-16-safe on both engines)
  private val HanLo = 0x4e00.toChar
  private val HanHi = 0x9fff.toChar

  /** Mixed-script tokenization: whitespace-style word tokens for
    * non-CJK runs PLUS character bigrams inside each CJK run (a lone
    * CJK char keeps itself) — the standard han-bigram fallback for
    * corpora where whitespace segmentation silently turns a Chinese
    * document into one giant token (df statistics, dedup shingles,
    * and classifier features all collapse). Scriptless segmentation:
    * the text first splits into maximal CJK / non-CJK-non-space runs,
    * so `abc中文` yields `abc` + one bigram. Pure `Column` transform
    * (regexp + HOFs), codegen end to end; the same segmentation is
    * SQL-expressible in DuckDB RE2 (`\x{4e00}` class syntax), which
    * is what keeps the gate oracle-checkable.
    */
  def tokensCjk(c: Column): Column = {
    val han = s"[$HanLo-$HanHi]"
    val segPattern = s"$han+|[^$HanLo-$HanHi\\s]+"
    val segs = regexp_extract_all(lower(trim(c)), lit(segPattern), lit(0))
    flatten(transform(segs, s =>
      when(s.rlike(s"^$han"),
        when(length(s) === 1, array(s))
          .otherwise(transform(sequence(lit(1), length(s) - 1),
            i => s.substr(i, lit(2)))))
        .otherwise(array(s))))
  }

  /** Predicate: token begins with a CJK ideograph (bigrams and lone
    * chars from [[tokensCjk]] both satisfy it).
    */
  def isCjkToken(t: Column): Column = t.rlike(s"^[$HanLo-$HanHi]")

  /** BPE-ish subword count: letter-runs, digits, and punctuation each
    * count as one token (the GPT-2 pre-tokenizer shape, minus byte
    * merges). A cheap, deterministic proxy for LLM token budgeting.
    */
  def bpeTokenCountApprox(c: Column): Column =
    coalesce(regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")), lit(0))

  /** Characters that are neither word chars nor whitespace. */
  def punctCount(c: Column): Column =
    coalesce(regexp_count(c, lit("[^A-Za-z0-9\\s]")), lit(0))

  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c).cast("double"))

  /** Stopword lists (public, abbreviated) per supported language. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "and", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "que", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "他"))

  def stopwordHits(c: Column, lang: String): Column =
    size(filter(tokens(c), t => array_contains(typedlit(stopwords(lang)), t)))

  def stopwordRatio(c: Column, lang: String = "en"): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(stopwordHits(c, lang).cast("double") / tokenCount(c).cast("double"))

  /** Heuristic quality score ∈ [0,1]: length sweet-spot, low
    * punctuation noise, natural-language stopword density.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(c, "en") * 5.0, lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3, 6)
  }

  /** Exact integer division for non-negative longs under 2^53:
    * (a - a mod b) / b — the numerator divides exactly, so the double
    * division is exact and the result is engine-independent.
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** `qualityScore` in exact integer micro-units [0..1,000,000] — the
    * cross-engine-reproducible form. Doubles can land on a rounding
    * boundary where two engines' last bits disagree (observed:
    * 0.6575125 rounding to 0.657512 vs 0.657513); pure 64-bit integer
    * arithmetic cannot.
    */
  def qualityScoreMicros(c: Column): Column = {
    val L = length(c).cast("long")
    val tok = tokenCount(c).cast("long")
    val lenM = least(L * 2000L, lit(1000000L))
    val punctM = lit(1000000L) -
      least(intDiv(punctCount(c).cast("long") * 5000000L,
        greatest(L, lit(1L))), lit(1000000L))
    val swM = least(intDiv(stopwordHits(c, "en").cast("long") * 5000000L,
      greatest(tok, lit(1L))), lit(1000000L))
    intDiv(lenM * 4L + punctM * 3L + swM * 3L, lit(10L))
  }

  /** N-gram-heuristic language ID: argmax of per-language stopword
    * hits with a fixed preference order on ties; "und" when no list
    * matches at all.
    */
  def langId(c: Column): Column = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val hits = langs.map(l => l -> stopwordHits(c, l)).toMap
    val best = hits.values.reduce((a, b) => greatest(a, b))
    langs.foldRight(when(best <= 0, lit("und")).otherwise(lit("und"))) {
      case (l, rest) => when(best > 0 && hits(l) === best, lit(l)).otherwise(rest)
    }
  }

  /** Word k-shingles: overlapping k-grams of whitespace tokens, the
    * unit set for MinHash/Jaccard dedup. Documents shorter than k
    * tokens yield their whole token sequence as one shingle.
    *
    * PERFORMANCE: pass a *materialized token-array column* (from
    * [[tokens]] in a separate projection), not a raw text column.
    * Sub-expressions referenced inside higher-order-function lambdas
    * are re-evaluated per array element — feeding the raw text here
    * makes tokenization run once per shingle position (measured ~30×
    * slowdown at sf0.1). A bound column reference is O(1) per element.
    * Catalyst's CollapseProject keeps the staged projection intact
    * (it refuses to inline non-cheap producers referenced multiple
    * times), so the two-step form is safe to write.
    */
  def shinglesFromTokens(t: Column, k: Int = 3): Column = {
    val n = size(t)
    when(n <= k, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(t, i, lit(k)))))
  }

  /** Convenience form over raw text — fine for small data / tests;
    * heavy pipelines should stage [[tokens]] first (see
    * [[shinglesFromTokens]]).
    */
  def shingles(c: Column, k: Int = 3): Column =
    shinglesFromTokens(tokens(c), k)

  /** Within-document duplicate-shingle fraction — the Gopher-style
    * repetition quality signal (a looping or boilerplate document
    * repeats its own k-grams): 1 − |distinct shingles| / |shingles|,
    * rounded to 6 decimals. Pass a materialized shingle-array column
    * (see [[shinglesFromTokens]] on lambda re-evaluation); the divisor
    * is ≥ 1 by construction (short docs yield one whole-text shingle).
    */
  def repetitionRatio(sh: Column): Column =
    round(lit(1.0) -
      size(array_distinct(sh)).cast("double") / size(sh).cast("double"), 6)

  /** Sliding-window token chunks for training-data preparation: windows
    * of `chunkSize` tokens every `chunkSize - overlap` tokens, tagged
    * with their 1-based start-token offset. Emitted as an array of
    * (chunk_start, chunk) structs to explode — a narrow, shuffle-free
    * row multiplication (the 100 TB chunking shape: chunking happens
    * scan-side, repartitioning only if the writer needs it).
    * Input is a materialized token-array column (see shinglesFromTokens
    * note on lambda evaluation).
    */
  def chunkStructs(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    // stop at the FIRST window that reaches the last token: any later
    // grid start is wholly contained in its predecessor, which would
    // emit the document tail as a pure-duplicate training sample
    // (lastStart = 1 + stride·⌈max(0, n − chunkSize)/stride⌉, exact in
    // doubles far past any real token count)
    val lastStart = (lit(1) + lit(stride) *
      floor((greatest(size(toks) - lit(chunkSize), lit(0)) +
        lit(stride - 1)) / lit(stride))).cast("int")
    val windows = transform(sequence(lit(1), lastStart, lit(stride)), i =>
      struct(i.as("chunk_start"),
        concat_ws(" ", slice(toks, i, lit(chunkSize))).as("chunk")))
    // empty token array → no chunks (sequence(1, 0) would throw)
    when(size(toks) === 0,
      array().cast("array<struct<chunk_start:int,chunk:string>>"))
      .otherwise(windows)
  }

  /** PII scrubbing for training corpora — a pure codegen'd
    * regexp_replace chain (patterns restricted to syntax with identical
    * semantics in Java regex and RE2, so the DuckDB oracle mirrors them
    * verbatim). Exact coverage, so callers don't over-assume:
    *  - emails: local@domain.tld (ASCII);
    *  - NANP-style phones: 3-3-4 digit groups separated by `-`, `.` or
    *    space, optional `(area)` parens and optional `+1`/`1` prefix —
    *    NOT bare 10-digit runs or international formats;
    *  - IPv4: dotted quads whose octets are 0–255 (a version string
    *    like `1.2.3.4` is indistinguishable and is redacted; `999.1.2.3`
    *    is not an address and survives).
    * Phone runs before IP so `555.123.4567` reads as a phone.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("(\\+?1[-. ])?(\\([0-9]{3}\\)|\\b[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\\b",
      "<PHONE>"),
    ("\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b", "<IP>"))

  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }

  /** Per-row PII hit counts by category (the density report a scrub
    * pass ships next to the redacted corpus), over the same
    * [[piiPatterns]]. Each category counts on the text with the PRIOR
    * categories already redacted — the same sequential fold
    * [[redactPii]] applies — so the report counts exactly the spans
    * the redaction replaces. Counting every category on the raw text
    * would double-report nested spans: a dotted quad inside an email
    * local part ("a.10.0.0.1@example.com") matches the IP pattern on
    * its own, but redaction consumes it inside `<EMAIL>` and emits no
    * `<IP>` — the report must agree with the output it describes.
    */
  def piiCounts(c: Column): Column = {
    val afterEmail =
      regexp_replace(c, piiPatterns(0)._1, piiPatterns(0)._2)
    val afterPhone =
      regexp_replace(afterEmail, piiPatterns(1)._1, piiPatterns(1)._2)
    struct(
      regexp_count(c, lit(piiPatterns(0)._1)).as("n_email"),
      regexp_count(afterEmail, lit(piiPatterns(1)._1)).as("n_phone"),
      regexp_count(afterPhone, lit(piiPatterns(2)._1)).as("n_ip"))
  }

  /** C4-style boilerplate cleanup for scraped text: strip HTML-ish
    * tags, decode the five ubiquitous entities, collapse whitespace
    * runs, trim. A pure codegen'd regexp_replace chain (patterns are
    * Java-regex ∩ RE2 so the DuckDB oracle mirrors them verbatim, like
    * [[redactPii]]). Tags are stripped BEFORE entities are decoded, so
    * text that spells `&lt;script&gt;` stays escaped-as-text rather
    * than becoming a tag — the standard sanitizer ordering. `&amp;`
    * decodes LAST for the same reason: decoding it first manufactures
    * new entity spellings out of double-escaped text (`&amp;lt;` must
    * decode to the literal `&lt;`, not to `<`).
    */
  val entityDecodes: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&amp;" -> "&")

  def cleanBoilerplate(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = entityDecodes.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Full HTML → text extraction (the crawl step BEFORE every text
    * op): [[cleanBoilerplate]]'s tag strip + entity decode, preceded
    * by the removals a bare tag strip gets wrong — `<script>` and
    * `<style>` element CONTENT (code/CSS is not prose; a tag-only
    * strip would leak `var x=1;` into the corpus) and HTML comments.
    * Pure regexp_replace chain — whole-stage codegen, deliberately
    * backreference-free so the exact same patterns run under RE2
    * (DuckDB) for the cross-engine gate. Lazy `.*?` block matches are
    * linear-ish on sane documents; pathological unclosed-script pages
    * degrade to "nothing removed", never to a hang, because the
    * pattern then simply fails to match.
    */
  def htmlExtract(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComments = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    cleanBoilerplate(noComments)
  }

  /** Polynomial rolling-hash fingerprint of the full document, mod a
    * Mersenne-ish prime so the same value is computable in any engine
    * without 64-bit overflow (DuckDB BIGINT overflow is strict).
    */
  def fingerprint(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)
}
