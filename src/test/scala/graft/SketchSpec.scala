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
