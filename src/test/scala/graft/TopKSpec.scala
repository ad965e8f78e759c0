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

  test("heap buffer matches brute-force sorted top-k (k up to 100, with merge)") {
    val rnd = new scala.util.Random(11)
    def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    for (k <- Seq(1, 5, 100); _ <- 1 to 3) {
      // coarse scores force tie-break coverage
      val rows = Seq.fill(2000)(
        (rnd.nextInt(40) / 40.0, rnd.nextInt(500).toLong))
      val expected = rows.sortWith(lt).take(k)
      val whole = TopK.TopKBuf(new Array[Double](k), new Array[Long](k), 0)
      rows.foreach { case (s, id) => whole.insert(s, id) }
      assert(whole.sortedPairs == expected, s"k=$k single-buffer")
      // partial buffers merged (the shuffle path)
      val (l, r) = rows.splitAt(rows.size / 3)
      val a = TopK.TopKBuf(new Array[Double](k), new Array[Long](k), 0)
      val b = TopK.TopKBuf(new Array[Double](k), new Array[Long](k), 0)
      l.foreach { case (s, id) => a.insert(s, id) }
      r.foreach { case (s, id) => b.insert(s, id) }
      val merged = new graft.operators.TopK.TopKAggregator(k).merge(a, b)
      assert(merged.sortedPairs == expected, s"k=$k merged")
    }
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
