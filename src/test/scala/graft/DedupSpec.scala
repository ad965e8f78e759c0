package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "completely different text about spark query engines and data"),
    (5L, "another unrelated document mentioning embeddings vectors and search")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one min-id row per distinct content") {
    val kept = Dedup.exactRows(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("exact dedup: null-text rows are unknown, not equal — all survive") {
    val withNulls = Seq((1L, Some("same text")), (2L, Some("same text")),
      (3L, Option.empty[String]), (4L, None), (5L, Some("other")))
      .toDF("doc_id", "text")
    val kept = Dedup.exactRows(withNulls, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 2 deduped against 1; BOTH null-text rows kept
    assert(kept == Seq(1L, 3L, 4L, 5L))
  }

  test("dropRepeatedLines strips corpus-wide boilerplate lines, keeps " +
    "order, short lines, nulls, and all-boilerplate docs") {
    val footer = "subscribe to our newsletter for updates"
    val docs = Seq(
      (1L, s"real content line one\nshort\n$footer\nreal content line two"),
      (2L, s"$footer\nunique second document body text here"),
      (3L, s"another unique body\nshort\n$footer"),
      (4L, footer),                         // nothing but boilerplate
      (5L, null.asInstanceOf[String]),      // unknown content stays unknown
      (6L, "short\nme too")                 // short repeated lines survive
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .dropRepeatedLines(docs, "text", "doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "real content line one\nshort\nreal content line two")
    assert(got(2L) == "unique second document body text here")
    assert(got(3L) == "another unique body\nshort")
    assert(got(4L) == "", "an all-boilerplate doc must become empty")
    assert(got(5L) == null, "null text must stay null")
    assert(got(6L) == "short\nme too",
      "short lines are never counted as boilerplate")
  }

  test("duplicateSpans: cross-doc n-gram windows surface with exact " +
    "counts; within-doc repeats alone do not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta shared one two three four tail"),
      (2L, "prefix shared one two three four tail ending here"),
      (3L, "solo words solo words solo words solo words solo words"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .duplicateSpans(docs, "text", "doc_id", n = 6)
      .as[(String, Long, Long)].collect()
      .map { case (s, d, o) => s -> ((d, o)) }.toMap
    // docs 1 and 2 share exactly one 6-token run; doc 3's self-repeats
    // are ONE document and must never be reported
    assert(got == Map("shared one two three four tail" -> ((2L, 2L))),
      s"got $got")
  }

  test("exact jaccard: identity 1.0, near-dup high, unrelated low") {
    val j = corpus.as("a").crossJoin(corpus.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.jaccard(col("a.text"), col("b.text")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.7)
    assert(j((1L, 4L)) < 0.1)
  }

  test("minhash signature estimates jaccard within tolerance") {
    val est = Dedup.minhashCandidates(corpus, "text", "doc_id",
        numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the exact-dup pair must surface with est ≈ 1
    assert(est.contains((1L, 2L)) && est((1L, 2L)) == 1.0)
    // near-dup pair surfaces with high estimate
    assert(est.get((1L, 3L)).forall(_ > 0.5))
  }

  test("nearDupPairs: finds planted dups, rejects unrelated, exact jaccard attached") {
    val pairs = Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).size == 2 })
  }

  test("simhash: identical text → distance 0; near dup → small; unrelated → large") {
    val sh = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("simhashCandidates surfaces the exact dup at hamming 0") {
    val cands = Dedup.simhashCandidates(corpus, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(cands.get((1L, 2L)).contains(0))
  }

  test("lsh bucket skew guard drops oversized buckets") {
    val many = (1L to 50L).map(i => (i, "identical text shared by every row here"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(many, "text", "doc_id",
      maxBucketSize = 10)
    assert(capped.count() == 0) // bucket of 50 > cap → dropped, no pair storm
  }

  test("minhashCandidateStats accounts for what the skew cap skipped") {
    val many = (1L to 50L).map(i => (i, "identical text shared by every row here"))
      .toDF("doc_id", "text")
    // identical docs → identical signatures → one bucket of 50 per band
    val s = Dedup.minhashCandidateStats(many, "text", "doc_id",
      maxBucketSize = 10)
    assert(s.buckets == 8)
    assert(s.droppedBuckets == 8)
    assert(s.droppedPairs == 8L * (50L * 49L / 2))
    // same corpus under the default cap: nothing dropped
    val s2 = Dedup.minhashCandidateStats(many, "text", "doc_id")
    assert(s2.droppedBuckets == 0 && s2.droppedPairs == 0)
  }

  test("gate corpus is clean under the gate cap (no silent truncation)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.union(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" planted near duplicate")).as("text")))
    val s = Dedup.minhashCandidateStats(planted, "text", "doc_id")
    assert(s.droppedBuckets == 0 && s.droppedPairs == 0,
      s"q_d_minhash_lsh silently drops pairs: $s")
  }

  test("connectedComponents matches a local union-find on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // local union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = verts.map(v => v ->
      verts.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
    // both execution paths must agree with the ground truth: the
    // bounded local union-find (default, this graph fits) and the
    // iterative min-label propagation (forced via maxLocalEdges = 0)
    val local = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val iterative = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), maxLocalEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == expected)
    assert(iterative == expected)
  }

  test("resolveDuplicates keeps one canonical row per transitive group") {
    // pairs (1,2), (2,3): {1,2,3} collapse to 1; 4 and 5 untouched
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.resolveDuplicates(corpus, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("connectedComponents leaves no persisted blocks and needs few rounds " +
    "for a long chain (path halving)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // a 64-chain: diameter 63 — naive propagation needs 63 rounds,
    // pointer jumping converges within the 25-round default
    val chain = (1L until 64L).map(i => (i - 1, i)).toDF("id_a", "id_b")
    // force the iterative path: this test pins ITS round count/hygiene
    val comps = Dedup.connectedComponents(chain, maxLocalEdges = 0L)
      .as[(Long, Long)].collect()
    assert(comps.length == 64 && comps.forall(_._2 == 0L))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("nearDupPairs leaves no persisted blocks in the session") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.5).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("decontaminate drops exactly the docs sharing a shingle with the " +
    "benchmark set") {
    // benchmark doc's 3-shingles: "eval question alpha", "question
    // alpha beta", "alpha beta gamma". Doc 11 contains "question alpha
    // beta" → contaminated; 12 reuses the words but never 3 in
    // benchmark order → clean; 13 is disjoint; 14 is shorter than k
    // (whole-text shingle "alpha beta", not a benchmark shingle) → clean
    val benchmark = Seq((100L, "eval question alpha beta gamma"))
      .toDF("doc_id", "text")
    val corp = Seq(
      (11L, "intro text question alpha beta closing words"),
      (12L, "beta alpha question in scrambled order here"),
      (13L, "completely unrelated content entirely"),
      (14L, "alpha beta")
    ).toDF("doc_id", "text")
    val bad = Dedup.contaminatedIds(corp, benchmark, "text", "doc_id")
      .as[Long].collect().sorted.toSeq
    assert(bad == Seq(11L))
    val kept = Dedup.decontaminate(corp, benchmark, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(12L, 13L, 14L))
    // overlap threshold: doc 11 shares exactly ONE distinct shingle
    // ("question alpha beta") — a minShared=2 pass tolerates it
    val strict = Dedup.contaminatedIds(corp, benchmark, "text", "doc_id",
      minShared = 2).as[Long].collect()
    assert(strict.isEmpty)
    val benchDoc = Seq((200L, "intro text question alpha beta closing"))
      .toDF("doc_id", "text") // shares 2+ shingles with doc 11
    val strict2 = Dedup.contaminatedIds(corp, benchDoc, "text", "doc_id",
      minShared = 2).as[Long].collect().toSeq
    assert(strict2 == Seq(11L))
  }

  test("Bloom sketch: no false negatives; false-positive rate near fpp") {
    import graft.operators.Bloom
    val n = 20000
    val inserted = (0 until n).map(i => i.toLong * 2654435761L + 17L)
    val df = inserted.toDF("k")
    val sketch = Bloom.build(df, "k", n.toLong, fpp = 0.01)
    // no false negatives — the load-bearing property for prefiltering
    assert(inserted.forall(sketch.mightContain),
      "inserted key reported absent")
    // fp rate on a disjoint probe set: binomial(50k, ~0.01) stays
    // under 3×fpp with overwhelming margin
    val probes = (0 until 50000).map(i => -1L - i * 7919L)
    val fps = probes.count(sketch.mightContain)
    assert(fps.toDouble / probes.size < 0.03,
      s"false-positive rate ${fps.toDouble / probes.size} >= 0.03")
    assert(sketch.sizeBytes < 64 * 1024, "sketch unexpectedly large")
  }

  test("broadcastSketch handle: one broadcast serves many probes and " +
    "survives explicit destroy ordering") {
    import graft.operators.Bloom
    val keys = spark.range(0, 1000).toDF("k")
    val sketch = Bloom.build(keys, "k", 1000L, 0.01)
    val bc = Bloom.broadcastSketch(spark, sketch)
    try {
      // two independent plans share the SAME broadcast handle
      val hits1 = spark.range(0, 2000).toDF("k")
        .filter(Bloom.mightContain(col("k"), bc)).count()
      val hits2 = spark.range(500, 1500).toDF("k")
        .filter(Bloom.mightContain(col("k"), bc)).count()
      assert(hits1 >= 1000, "false negatives through the handle")
      assert(hits2 >= 500)
    } finally bc.destroy() // caller-owned lifecycle, released eagerly
  }

  test("decontaminateBloom ≡ decontaminate (prefilter is invisible)") {
    val benchmark = Seq((100L, "eval question alpha beta gamma"),
      (200L, "intro text question alpha beta closing"))
      .toDF("doc_id", "text")
    val corp = Seq(
      (11L, "intro text question alpha beta closing words"),
      (12L, "beta alpha question in scrambled order here"),
      (13L, "completely unrelated content entirely"),
      (14L, "alpha beta")
    ).toDF("doc_id", "text")
    for (minShared <- Seq(1, 2)) {
      val exact = Dedup.decontaminate(corp, benchmark, "text", "doc_id",
        minShared = minShared).select("doc_id").as[Long].collect().sorted.toSeq
      val bloom = Dedup.decontaminateBloom(corp, benchmark, "text", "doc_id",
        minShared = minShared).select("doc_id").as[Long].collect().sorted.toSeq
      assert(bloom == exact, s"minShared=$minShared: $bloom vs $exact")
    }
    // and with a deliberately terrible fpp (tiny sketch, many false
    // positives) the exact verify still yields the identical relation
    val noisy = Dedup.decontaminateBloom(corp, benchmark, "text", "doc_id",
      fpp = 0.5).select("doc_id").as[Long].collect().sorted.toSeq
    assert(noisy == Seq(12L, 13L, 14L))
  }

  test("removeDuplicateSpans excises all but the canonical occurrence, " +
    "merges overlapping windows, and passes short/null docs through") {
    val shared = "one two three four five six seven eight nine ten" // 10 toks
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"prefix words here $shared suffix thing"),
      (3L, "totally unrelated short document"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 8)
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    // doc 1 holds every canonical occurrence (min id) → unchanged
    assert(got(1L) == s"alpha beta $shared gamma delta")
    // doc 2 loses the WHOLE 10-token shared run: its three 8-token
    // windows overlap and their coverage union is excised as one merged
    // region — no partial-window fragments survive
    assert(got(2L) == "prefix words here suffix thing")
    assert(got(3L) == "totally unrelated short document")
    assert(got(4L) == null, "null text must stay null")
  }

  test("removeDuplicateSpans: a full copy cleans to empty; a within-doc " +
    "repeat of a duplicated span is excised even in the canonical doc") {
    val span = "a1 a2 a3 a4 a5 a6 a7 a8" // exactly n = 8 tokens
    val docs = Seq(
      (1L, s"$span filler middle words $span"), // repeat inside canon doc
      (2L, s"other content $span trailing"),
      (3L, s"$span filler middle words $span")  // exact copy of doc 1
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "text", "doc_id", n = 8)
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    // doc 3 is a verbatim copy of doc 1: every window's canonical
    // occurrence lives in doc 1 → doc 3 cleans to the empty string
    assert(got(3L) == "")
    // doc 2 keeps its unique text, loses the shared span
    assert(got(2L) == "other content trailing")
    // doc 1 (canonical): every window string's canonical occurrence is
    // here, so nearly everything survives — including most of the tail
    // repeat, whose tokens are covered by canonical BRIDGING windows
    // (start 5..11, spanning the junction). The one excised token is
    // the last one: idx 19 is covered ONLY by the within-doc repeat
    // occurrence of the span window (start 12), whose canonical start
    // is 1 — pinning that within-doc repeats are excised exactly where
    // no canonical window reaches
    assert(got(1L) == s"$span filler middle words a1 a2 a3 a4 a5 a6 a7")
  }

  test("decontaminateSpans cuts every benchmark occurrence (no canonical " +
    "survivor), merges overlaps, and leaves clean docs alone") {
    val leak = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10" // a 10-token eval question
    val bench = Seq((100L, s"benchmark intro $leak benchmark outro"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"alpha beta $leak gamma"),     // leak mid-doc
      (2L, s"$leak"),                      // doc IS the leak
      (3L, "entirely original text here"), // untouched
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(corpus, bench, "text", "doc_id",
      n = 8).select("doc_id", "text_clean").as[(Long, String)]
      .collect().toMap
    // the three overlapping 8-windows inside the 10-token leak cover
    // all 10 tokens — the whole leak vanishes, no survivor anywhere
    assert(got(1L) == "alpha beta gamma")
    assert(got(2L) == "")
    assert(got(3L) == "entirely original text here")
    assert(got(4L) == null)
  }

  test("dedupLinesWithinDoc keeps first occurrences in order, is pure " +
    "per-doc (identical lines in OTHER docs survive), nulls pass through") {
    val docs = Seq(
      (1L, "nav bar\ncontent one\nnav bar\ncontent two\nnav bar"),
      (2L, "nav bar\nother page"), // cross-doc repeat NOT removed here
      (3L, null.asInstanceOf[String]),
      (4L, "single line")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLinesWithinDoc(docs, "text")
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    assert(got(1L) == "nav bar\ncontent one\ncontent two")
    assert(got(2L) == "nav bar\nother page")
    assert(got(3L) == null)
    assert(got(4L) == "single line")
  }

  test("incrementalNearDups: union over increments equals a full " +
    "recompute, with no persisted blocks left behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // planted copies of every 7th doc — the increment split below puts
    // many (original, copy) pairs in DIFFERENT batches, so equivalence
    // genuinely exercises the new×stored join path
    val planted = docs.union(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val idx = java.nio.file.Files
      .createTempDirectory("graft-incdedup").toString + "/idx"
    val got = (0 to 2).flatMap { i =>
      val batch = planted.filter(pmod(xxhash64(col("doc_id")), lit(3)) === i)
      Dedup.incrementalNearDups(batch, "text", "doc_id", idx, batchId = i,
          threshold = 0.5)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect()
    }.toSet
    val full = Dedup.nearDupPairs(planted, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == full,
      s"incremental-only=${got -- full}, full-only=${full -- got}")
    assert(got.nonEmpty, "vacuous equivalence: no pairs at all")
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("incrementalNearDups reports only pairs involving the new batch, " +
    "replays deterministically, and rejects mismatched parameters") {
    val idx = java.nio.file.Files
      .createTempDirectory("graft-incdedup2").toString + "/idx"
    val text = "the quick brown fox jumps over the lazy dog again today"
    val b0 = Seq((1L, text), (2L, text),
      (4L, "completely different text about engines and data"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, text)).toDF("doc_id", "text")
    val first = Dedup.incrementalNearDups(b0, "text", "doc_id", idx,
        batchId = 0, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(first == Set((1L, 2L)))
    val second = Dedup.incrementalNearDups(b1, "text", "doc_id", idx,
        batchId = 1, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the old×old pair (1,2) must NOT resurface — it was reported the
    // night it formed
    assert(second == Set((1L, 3L), (2L, 3L)))
    // replay of a committed batch: no new version, identical output
    // (the candidates are rebuilt from the STORE, not from b1's plan)
    val replay = Dedup.incrementalNearDups(b1, "text", "doc_id", idx,
        batchId = 1, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(replay == second)
    val vt = new graft.engine.VersionedTable(spark, s"$idx/sigs")
    assert(vt.versions == Seq(0L, 1L),
      s"replay must not commit a new generation: ${vt.versions}")
    // an index signed under k=3 must refuse a k=4 caller outright
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(b1, "text", "doc_id", idx, batchId = 2,
        threshold = 0.9, k = 4)
    }
    assert(e.getMessage.contains("never be compared"))
  }

  test("compactSignatureIndex: a later increment computes the SAME pairs " +
    "against the compacted index, with a smaller ledger; retired ids " +
    "stop matching") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.union(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    def batch(i: Int) =
      planted.filter(pmod(xxhash64(col("doc_id")), lit(4)) === i)
    def fileCount(idx: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/sigs/_gen")
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = f.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-sigcompact").toString
    val control = s"$root/control"
    val compacted = s"$root/compacted"
    (0 to 2).foreach { i =>
      Seq(control, compacted).foreach(idx =>
        Dedup.incrementalNearDups(batch(i), "text", "doc_id", idx,
          batchId = i, threshold = 0.5))
    }
    val filesBefore = fileCount(compacted)
    Dedup.compactSignatureIndex(spark, compacted, upTo = 2L)
    assert(fileCount(compacted) < filesBefore,
      s"squash must shrink the ledger: $filesBefore -> ${fileCount(compacted)}")
    assert(new graft.engine.VersionedTable(spark, s"$compacted/sigs")
      .versions == Seq(2L))
    // exactness: batch 3 sees identical pairs through either index —
    // the squash preserved (id, shingle_set, sig) rows verbatim
    def run(idx: String) =
      Dedup.incrementalNearDups(batch(3), "text", "doc_id", idx,
          batchId = 3, threshold = 0.5)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val viaControl = run(control)
    val viaCompacted = run(compacted)
    assert(viaCompacted == viaControl,
      s"compacted-only=${viaCompacted -- viaControl}, " +
        s"control-only=${viaControl -- viaCompacted}")
    assert(viaControl.nonEmpty, "vacuous equivalence: no pairs at all")

    // retirement: drop one side of a known near-dup pair from a THIRD
    // index — the retired id must stop forming pairs with new arrivals
    val retire = s"$root/retire"
    val text = "the quick brown fox jumps over the lazy dog again today"
    Dedup.incrementalNearDups(
      Seq((1L, text), (4L, "unrelated text about engines and data"))
        .toDF("doc_id", "text"),
      "text", "doc_id", retire, batchId = 0, threshold = 0.9)
    Dedup.compactSignatureIndex(spark, retire, upTo = 0L,
      retiredIds = Some(Seq(1L).toDF("doc_id")))
    val after = Dedup.incrementalNearDups(
      Seq((9L, text)).toDF("doc_id", "text"),
      "text", "doc_id", retire, batchId = 1, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after.isEmpty,
      s"retired id 1 must not match new arrivals, got $after")
  }

  test("winnowing: the guarantee holds (every pair sharing a >= " +
    "w+k-1-token run is a candidate), the fingerprint set is a real " +
    "compression of the gram set, and the confirmed arm equals the " +
    "exact shared-span relation computed by brute force") {
    import graft.functions.NativeExpressions
    val (k, w) = (4, 4); val t = w + k - 1 // 7
    // a 7-token span planted into otherwise-unrelated documents, at
    // different positions; doc 13 shares nothing
    val span = "zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (10L, s"alpha beta gamma $span delta epsilon one two three"),
      (11L, s"$span completely different tail words here now okay"),
      (12L, s"prefix words go here first and then $span"),
      (13L, "unrelated text with none of the planted sequence at all " +
        "padding padding padding"))
      .toDF("doc_id", "text")
    val cands = Dedup.winnowCandidates(docs, "text", "doc_id", k, w)
      .as[(Long, Long)].collect().toSet
    val spanPairs = Set((10L, 11L), (10L, 12L), (11L, 12L))
    assert(spanPairs.subsetOf(cands),
      s"guarantee: shared >=$t-token runs must be candidates: $cands")
    assert(!cands.exists(p => p._1 == 13L || p._2 == 13L),
      s"doc 13 shares no span and no fingerprint here: $cands")
    // compression: winnowed fingerprints are a strict sample of the
    // gram hashes (expected density 2/(w+1) = 0.4)
    val counts = docs.select(
        size(NativeExpressions.winnowSet(col("text"), k, w)).as("nf"),
        size(NativeExpressions.shingleHashSet(col("text"), k)).as("ng"))
      .as[(Int, Int)].collect()
    counts.foreach { case (nf, ng) =>
      assert(nf <= ng && nf >= 1, s"selection must sample: $nf of $ng") }
    val (tf, tg) = counts.map(c => (c._1.toLong, c._2.toLong))
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    info(f"winnow density: $tf of $tg grams = ${tf.toDouble / tg}%.2f " +
      f"(expected ~ ${2.0 / (w + 1)}%.2f)")
    assert(tf.toDouble / tg <= 0.75,
      "selection must compress the gram set materially")
    // confirmed == brute-force shared-t-gram relation
    val got = Dedup.winnowSpanConfirmed(docs, "text", "doc_id", k, w)
      .as[(Long, Long, Long)].collect().toSet
    def grams(s: String): Set[String] = {
      val toks = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length <= t) Set(toks.mkString(" "))
      else toks.sliding(t).map(_.mkString(" ")).toSet
    }
    val texts = docs.as[(Long, String)].collect().toMap
    val want = (for {
      a <- texts.keys; b <- texts.keys if a < b
      n = (grams(texts(a)) intersect grams(texts(b))).size if n >= 1
    } yield (a, b, n.toLong)).toSet
    assert(got == want,
      s"confirmed != exact relation:\n got=$got\n want=$want")
  }

  test("winnowCandidateStats accounts exactly for what a bucket cap " +
    "drops: boilerplate-only pairs vanish from the capped candidates " +
    "and reappear as droppedBuckets/droppedPairs (round-15 ADVICE)") {
    val (k, w) = (4, 4)
    // six docs whose ONLY shared content is one 12-token boilerplate
    // run (every other token is unique per doc): a window fully
    // inside the run selects the same minimum gram hash in all six
    // docs, so every shared fingerprint bucket has exactly 6 members
    val boiler = "terms of service apply to all content on this site " +
      "reserved"
    val docs = (0 until 6).map { i =>
      (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e $boiler " +
        s"u${i}x u${i}y u${i}z")
    }.toDF("doc_id", "text")
    val allPairs = (for {
      a <- 0L until 6L; b <- 0L until 6L if a < b
    } yield (a, b)).toSet
    val uncapped = Dedup.winnowCandidates(docs, "text", "doc_id", k, w,
      maxBucketSize = Int.MaxValue).as[(Long, Long)].collect().toSet
    assert(uncapped == allPairs,
      s"uncapped: every pair shares the boilerplate run: $uncapped")
    // first-principles replay: bucket = distinct doc set per selected
    // fingerprint (edge windows mix unique context, so a few small
    // incidental buckets exist alongside the 6-member boilerplate
    // ones — the accounting must match them all exactly)
    val fpRows: Seq[(Long, Long)] = docs.select(col("doc_id"),
        explode(graft.functions.NativeExpressions
          .winnowSet(col("text"), k, w)).as("__fp"))
      .as[(Long, Long)].collect().toSeq.distinct
    val buckets: Seq[Set[Long]] = fpRows.groupBy(_._2).values
      .map(_.map(_._1).toSet).filter(_.size >= 2).toSeq
    val cap = 3
    val dropped = buckets.filter(_.size > cap)
    assert(dropped.exists(_.size == 6),
      s"construction: the boilerplate bucket must exceed the cap")
    val capped = Dedup.winnowCandidates(docs, "text", "doc_id", k, w,
      maxBucketSize = cap).as[(Long, Long)].collect().toSet
    val keptPairs = buckets.filter(_.size <= cap).flatMap(b =>
      for (a <- b; c <- b if a < c) yield (a, c)).toSet
    assert(capped == keptPairs,
      s"capped candidates must be exactly the under-cap buckets' " +
        s"pairs:\n got=$capped\n want=$keptPairs")
    assert(capped != allPairs,
      "the cap must actually lose boilerplate-only pairs here")
    val st = Dedup.winnowCandidateStats(docs, "text", "doc_id", k, w,
      maxBucketSize = cap)
    assert(st.buckets == buckets.size &&
      st.droppedBuckets == dropped.size &&
      st.droppedPairs == dropped.map(b =>
        b.size.toLong * (b.size - 1) / 2).sum,
      s"accounting must replay the bucket census exactly: $st vs " +
        s"${buckets.size}/${dropped.size}")
    val stOff = Dedup.winnowCandidateStats(docs, "text", "doc_id", k, w,
      maxBucketSize = Int.MaxValue)
    assert(stOff.droppedBuckets == 0 && stOff.droppedPairs == 0,
      s"uncapped run drops nothing: $stOff")
  }
}
