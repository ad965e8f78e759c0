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
}
