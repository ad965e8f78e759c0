package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("CMS never undercounts, overcount bounded, merge = concat of streams") {
    implicit val s = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum

    val cms = Sketch.sketchTokens(docs, "text", depth = 4, width = 1 << 12)
    assert(cms.totalCount == n)
    exact.foreach { case (tok, true_n) =>
      val est = cms.estimate(tok)
      assert(est >= true_n, s"CMS undercounted $tok: $est < $true_n")
      assert(est - true_n <= 2L * n / (1 << 12) + 1,
        s"CMS overcount for $tok beyond bound: $est vs $true_n (N=$n)")
    }
    // absent token estimates only collision noise
    assert(cms.estimate("zz_never_seen_zz") <= 2L * n / (1 << 12) + 1)

    // distributive: sketch(A ∪ B) == sketch(A) ⊕ sketch(B)
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val merged = Sketch.sketchTokens(a, "text", 4, 1 << 12)
      .merge(Sketch.sketchTokens(b, "text", 4, 1 << 12))
    assert(merged.counters.toSeq == cms.counters.toSeq)
  }

  test("CMS estimates are deterministic across partitionings") {
    implicit val s = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val c1 = Sketch.sketchTokens(docs.repartition(1), "text")
    val c2 = Sketch.sketchTokens(docs.repartition(7), "text")
    assert(c1.counters.toSeq == c2.counters.toSeq)
  }

  test("HLL: estimate within the standard-error envelope at large and " +
    "small cardinalities") {
    implicit val s = spark
    // large regime: 100k distinct at p=12 → σ ≈ 1.6%; assert 4σ
    val big = spark.range(100000).toDF("v")
    val est = Sketch.distinctCount(big, "v")
    assert(math.abs(est - 100000.0) / 100000.0 < 0.065,
      s"estimate $est too far from 100000")
    // small regime: linear counting — near exact
    val small = spark.range(200).toDF("v")
    val estS = Sketch.distinctCount(small, "v")
    assert(math.abs(estS - 200.0) / 200.0 < 0.02, s"small-range $estS")
    // duplicates are idempotent (unlike CMS): 3 copies, same estimate
    val dup = big.union(big).union(big)
    assert(Sketch.distinctCount(dup, "v") == est)
  }

  test("HLL: nulls are not a distinct element (filtered before hashing)") {
    implicit val s = spark
    val withNull = Seq(Some("a"), Some("b"), None, Some("a"))
      .toDF("v")
    assert(Sketch.distinctCount(withNull, "v") == 2L,
      "null was counted as a distinct value")
    val grouped = Seq((Some("g"), Some("a")), (Some("g"), None),
      (Option.empty[String], Some("x"))).toDF("g", "v")
    val got = Sketch.distinctPerGroup(grouped, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g" -> 1L), s"null contract violated: $got")
  }

  test("KMV: exact below saturation, estimate within the 1/sqrt(k-2) " +
    "envelope above it, deterministic across partitionings") {
    implicit val s = spark
    // unsaturated regime: the sketch holds every distinct hash → exact
    val small = spark.range(150)
      .select(lit("g").as("g"), col("id").cast("string").as("v"))
    val got = Sketch.kmvDistinctPerGroup(small, "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("g", 150L, 150L)), s"unsaturated: ${got.toSeq}")
    // saturated regime: 50k distinct at k=256 → σ ≈ 6.3%; assert 4σ
    val big = spark.range(50000)
      .select(lit("g").as("g"), col("id").cast("string").as("v"))
    val est = Sketch.kmvDistinctPerGroup(big, "g", "v", k = 256)
      .collect().head
    assert(est.getLong(2) == 256L, "saturated sketch_rows must be k")
    assert(math.abs(est.getLong(1) - 50000.0) / 50000.0 < 0.26,
      s"estimate ${est.getLong(1)} too far from 50000")
    // duplicates are idempotent; partitioning never changes the result
    // (this exactness is what makes KMV the oracle-able sketch)
    val dup = big.union(big).union(big)
    val a = Sketch.kmvDistinctPerGroup(dup.repartition(1), "g", "v", k = 256)
      .collect().head.getLong(1)
    val b = Sketch.kmvDistinctPerGroup(dup.repartition(7), "g", "v", k = 256)
      .collect().head.getLong(1)
    assert(a == est.getLong(1) && b == est.getLong(1),
      s"partitioning/duplication changed the KMV estimate: $a / $b vs " +
        s"${est.getLong(1)}")
  }

  test("KMV: merge = keep k smallest of the union; null contract") {
    implicit val s = spark
    // scrambled insertion order on both sides; overlap between them
    val all = (1L to 500L).map(i => (i * 48271L) % 1000003L).distinct
    val (ea, eb) = all.partition(_ % 3 == 0)
    def sk(xs: Seq[Long]): Sketch.Kmv = {
      val m = Sketch.Kmv.empty(64); xs.foreach(m.add); m
    }
    val merged = sk(ea).merge(sk(eb ++ ea.take(10)))
    val direct = all.sorted.take(64)
    assert(merged.arr.take(merged.n).toSeq == direct,
      "merged sketch is not the k smallest of the union")
    assert(merged.estimate == sk(all).estimate,
      "merge path and single-stream path disagree")
    val withNull = Seq((Some("g"), Some("a")), (Some("g"), None),
      (Option.empty[String], Some("x"))).toDF("g", "v")
    val got = Sketch.kmvDistinctPerGroup(withNull, "g", "v", k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g" -> 1L), s"null contract violated: $got")
  }

  test("KMV streaming fold equals the one-shot batch sketch, and a " +
    "replayed batch (restart recovery) changes nothing") {
    implicit val s = spark
    import graft.operators.Sketch.Kmv
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d = docs.select(
      graft.functions.NativeExpressions.textProfile(col("text"))
        .getField("lang_pred").as("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    val whole = Sketch.kmvPerGroup(d, "lang", "token", k = 16)
    val even = Sketch.kmvPerGroup(
      d.filter(crc32(col("token")) % 2 === 0), "lang", "token", k = 16)
    val odd = Sketch.kmvPerGroup(
      d.filter(crc32(col("token")) % 2 === 1), "lang", "token", k = 16)
    def fold(ms: Seq[Map[String, Kmv]]): Map[String, Kmv] = {
      val acc = scala.collection.mutable.Map.empty[String, Kmv]
      ms.foreach(_.foreach { case (g, sk) =>
        acc.get(g) match {
          case Some(c) => c.merge(sk); ()
          case None => acc(g) = Kmv(sk.k, sk.n, sk.arr.clone())
        }
      })
      acc.toMap
    }
    def view(m: Map[String, Kmv]) =
      m.view.mapValues(x => x.arr.take(x.n).toSeq).toMap
    assert(view(fold(Seq(even, odd))) == view(whole),
      "split fold != one-shot sketch")
    // replaying a batch after a restart is a no-op (idempotent merge)
    assert(view(fold(Seq(even, odd, odd))) == view(whole),
      "replayed batch changed the fold")
  }

  test("CMS fold over disjoint batches equals the one-shot sketch; a " +
    "replayed batch double-counts (the additive-merge caveat)") {
    implicit val s = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (a, b) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val whole = Sketch.sketchTokens(docs, "text")
    val ca = Sketch.sketchTokens(a, "text")
    val cb = Sketch.sketchTokens(b, "text")
    assert(ca.merge(cb).counters.toSeq == whole.counters.toSeq,
      "disjoint fold != one-shot sketch")
    // NOT idempotent: re-merging a batch inflates totals — the reason
    // the streaming CMS fold leans on checkpoint batch-skip where the
    // KMV fold is replay-safe by algebra
    val replay = Sketch.sketchTokens(a, "text")
      .merge(Sketch.sketchTokens(b, "text"))
      .merge(Sketch.sketchTokens(b, "text"))
    assert(replay.totalCount > whole.totalCount,
      "a replayed additive batch should double-count")
  }

  test("HLL is deterministic across partitionings; per-group matches " +
    "per-group exact within 5%") {
    implicit val s = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(
      graft.functions.NativeExpressions.textProfile(col("text"))
        .getField("lang_pred").as("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
    val a = Sketch.distinctPerGroup(toks.repartition(1), "lang", "token")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sketch.distinctPerGroup(toks.repartition(7), "lang", "token")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "partitioning changed the HLL estimates")
    val exact = toks.groupBy("lang")
      .agg(countDistinct(col("token")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, n) =>
      val e = a(lang)
      assert(math.abs(e - n.toDouble) / n < 0.05,
        s"$lang: est $e vs exact $n")
    }
  }
}
