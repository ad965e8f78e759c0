package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "beta gamma delta")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    (10L, "alpha beta gamma"),        // target-like
    (11L, "zeta eta theta iota"),     // target-unseen tokens
    (12L, "alpha alpha beta beta"),   // very target-like
    (13L, "")                         // no tokens -> no weight row
  ).toDF("doc_id", "text")

  test("importance weights: target-like documents outrank target-unseen " +
    "ones; token-free documents get no row") {
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L))
    assert(w(10L) > w(11L), s"target-like must outrank unseen: $w")
    assert(w(12L) > w(11L), s"target-like must outrank unseen: $w")
    // every token of doc 11 is target-unseen: strictly negative weight
    assert(w(11L) < 0, s"all-unseen doc must score negative: $w")
  }

  test("hashedWeights with a collision-free bucketing reproduces the " +
    "exact unhashed scores") {
    // vocabulary here is tiny; at 2^20 buckets a collision would need
    // two of ~10 tokens sharing a bucket — verify none do, then the
    // hashed model is a pure relabeling and scores must match EXACTLY
    val buckets = 1 << 20
    val vocab = raw.select(explode(graft.functions.TextFunctions
        .tokens(col("text"))).as("t"))
      .unionByName(target.select(explode(graft.functions.TextFunctions
        .tokens(col("text"))).as("t")))
      .distinct()
    val nBuckets = vocab
      .select(pmod(xxhash64(col("t")), lit(buckets.toLong)).as("b"))
      .distinct().count()
    assert(nBuckets == vocab.count(), "test premise: no bucket collisions")
    val plain = Dsir.importanceWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val hashed = Dsir.hashedWeights(raw, target, "text", "doc_id", buckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(hashed == plain, s"hashed=$hashed plain=$plain")
  }

  test("hashedWeights under HEAVY collisions still ranks an exact " +
    "target copy above unrelated text, and is deterministic") {
    val buckets = 4 // forces many collisions: the model survives
    val a = Dsir.hashedWeights(raw, target, "text", "doc_id", buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = Dsir.hashedWeights(raw, target, "text", "doc_id", buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == b, "hashed scoring must be deterministic across runs")
  }

  test("selectAboveQuantile keeps exactly the documents at or above " +
    "the threshold (ties kept)") {
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id")
    val kept = Dsir.selectAboveQuantile(w, 0.5, "doc_id")
      .select(col("doc_id")).as[Long].collect().toSet
    val all = w.orderBy(col("logw_micros").desc)
      .select(col("doc_id")).as[Long].collect()
    // 3 scored docs, median threshold -> top 2 survive
    assert(kept == all.take(2).toSet, s"kept=$kept ranked=${all.toSeq}")
    // q = 0 keeps everything
    assert(Dsir.selectAboveQuantile(w, 0.0, "doc_id").count() == 3)
  }

  test("empty target corpus: smoothing keeps scores finite") {
    val emptyTarget = target.filter(lit(false))
    val w = Dsir.importanceWeights(raw, emptyTarget, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(10L, 11L, 12L))
    // with no target evidence every token scores ln(1/V) on the
    // target side — FINITE (the +1 smoothing is what kills the -inf),
    // and small: |s_w| is bounded by ln(V·(N_r+V)) ≈ a few units, so a
    // document's micros weight is bounded by n_tokens · ~15e6
    assert(w.values.forall(v => math.abs(v) < 15L * 1000000L * 10),
      s"weights must stay finite and bounded under an empty target: $w")
  }
}
