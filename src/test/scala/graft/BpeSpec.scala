package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich corpus
  private val classic = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L)

  test("referenceTrain: classic corpus learns (e,s) then (es,t) — " +
    "exact-count argmax with lexicographic tie-break") {
    val merges = BpeTrainer.referenceTrain(classic, 4)
    // hand-computed: es=9, st=9, t</w>=9 tie → lexicographic min 'e';
    // then es+t=9 vs t</w>=9 tie → 'es' < 't'
    assert(merges.take(2) == Seq(Merge(0, "e", "s"), Merge(1, "es", "t")))
    assert(merges.map(_.rank) == (0 until merges.length))
  }

  test("distributed path ≡ local reference (forced via maxLocalVocab=0)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val local = BpeTrainer.train(docs, "text", numMerges = 10)
    val dist = BpeTrainer.train(docs, "text", numMerges = 10,
      maxLocalVocab = 0)
    assert(local == dist,
      s"paths diverge:\nlocal $local\ndist  $dist")
    assert(local.length == 10)
  }

  test("mergePair: left-to-right, non-overlapping ('aaa' + (a,a) → " +
    "[aa, a])") {
    val out = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(BpeTrainer.mergePair(col("syms"), "a", "a").as("m"))
      .head.getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("encode preserves content: subword concat rebuilds each word + " +
    "marker; more merges → fewer symbols") {
    val wcDf = classic.toSeq.toDF("word", "cnt")
    val merges = BpeTrainer.learnFromWordCounts(wcDf, 6)
    val df = Seq((1L, "low lower newest widest")).toDF("doc_id", "text")
    val enc = BpeTrainer.encode(df, "text", merges)
      .select(array_join(col("bpe_tokens"), "").as("joined"),
        size(col("bpe_tokens")).as("n"))
      .head
    assert(enc.getString(0) == "low</w>lower</w>newest</w>widest</w>")
    val n0 = BpeTrainer.encode(df, "text", Seq.empty)
      .select(size(col("bpe_tokens"))).head.getInt(0)
    assert(enc.getInt(1) < n0, "merges must shrink the symbol count")
  }

  test("merge sequence is stable under word-count table partitioning") {
    val wc = BpeTrainer.wordCounts(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text")
    val a = BpeTrainer.learnFromWordCounts(wc.repartition(1), 8,
      maxLocalVocab = 0)
    val b = BpeTrainer.learnFromWordCounts(wc.repartition(7), 8,
      maxLocalVocab = 0)
    assert(a == b, "partitioning changed the learned merges")
  }
}
