package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Throwaway profiling harness (not part of the engine surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROF_SF", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.union(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" planted near duplicate")).as("text")))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("corpus count")(corpus.count())
    val sig = corpus.withColumn("sig",
      Dedup.minhashSignature(col("text"), 3, 32))
    time("signatures")(sig.count())
    time("signatures again")(sig.count())
    val nsig = Dedup.minhashSignatures(corpus, "text", "doc_id")
    time("native sig")(nsig.agg(sum(element_at(col("sig"), 1))).head.getLong(0))
    val sets = Dedup.shingleSets(corpus, "text", "doc_id")
    time("shingle sets")(sets.agg(sum(size(col("shingle_set")))).head.getLong(0))
    val cands = Dedup.minhashCandidates(corpus, "text", "doc_id")
    time("candidates")(cands.count())
    val rows = 4
    val exploded = sig.select(col("doc_id"),
        explode(Dedup.lshBuckets(col("sig"), 8, rows)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"))
    val ndp = Dedup.nearDupPairs(corpus, "text", "doc_id", 0.3)
    time("nearDupPairs")(ndp.count())
    val cands2 = cands
    val ta = corpus.select(col("doc_id").as("id_a"), col("text").as("text_a"))
    val tb = corpus.select(col("doc_id").as("id_b"), col("text").as("text_b"))
    val joined = cands2.join(ta, "id_a").join(tb, "id_b")
    time("cands+textjoin")(joined.count())
    val withJ = joined.withColumn("j", Dedup.jaccard(col("text_a"), col("text_b"), 3))
    time("cands+jaccard")(withJ.count())
    spark.stop()
  }
}
