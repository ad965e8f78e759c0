package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeExpressions.cosine
import graft.operators.{SimilaritySearch, TopK}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals the window top-k, row for row") {
    implicit val s = spark
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 12)
    val windowed = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet

    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val scored = c.crossJoin(broadcast(
        q.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("n_vec")))
    val agged = TopK.topKPerKey(scored, k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet

    assert(agged == windowed)
  }

  test("aggregator handles ties deterministically and k > group size") {
    implicit val s = spark
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.5), (1L, 12L, 0.9),
      (2L, 20L, 0.1)).toDF("q_id", "n_id", "cosine")
    val got = TopK.topKPerKey(scored, k = 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 1, 12L, 0.9), (1L, 2, 10L, 0.5), (1L, 3, 11L, 0.5),
      (2L, 1, 20L, 0.1)))
  }
}
