package graft

import org.apache.spark.sql.functions._
import graft.functions.{NativeExpressions, TextFunctions, VectorFunctions}
import graft.operators.Dedup

/** The native Catalyst kernels must be value-identical to their
  * declarative (higher-order-function) counterparts — validated over
  * real testdata, not toy rows.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("MinHashSig == declarative staged signature on all sf0.001 docs") {
    val native = Dedup.minhashSignatures(docs, "text", "doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    val decl = Dedup.minhashSignaturesDeclarative(docs, "text", "doc_id")
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == decl.keySet)
    native.foreach { case (id, sig) => assert(sig == decl(id), s"doc $id") }
  }

  test("MinHashFromHashes(ShingleHashSet) == MinHashSig on all sf0.001 docs " +
    "plus edge rows") {
    // the one-pass dedup pipeline derives signatures from the stored
    // shingle-hash SET — bit-identity with hashing the raw text is the
    // contract (duplicate shingles can't change a minimum). Edge rows:
    // empty text (one "" shingle), short text (≤ k tokens), null.
    val extra = Seq((8001L, ""), (8002L, "one two"),
      (8003L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).union(extra)
    val fromSet = all.select(col("doc_id"),
      NativeExpressions.minhashFromHashes(
        NativeExpressions.shingleHashSet(col("text"))).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    val fromText = all.select(col("doc_id"),
      NativeExpressions.minhashSignature(col("text")).as("sig"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(fromSet.keySet == fromText.keySet)
    fromSet.foreach { case (id, sig) => assert(sig == fromText(id), s"doc $id") }
  }

  test("SimHash == declarative simhash on all sf0.001 docs") {
    val native = docs.select(col("doc_id"),
      NativeExpressions.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val decl = docs.select(col("doc_id"),
      Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    native.foreach { case (id, sh) => assert(sh == decl(id), s"doc $id") }
  }

  test("Fingerprint == declarative fingerprint on all sf0.001 docs") {
    val native = docs.select(col("doc_id"),
      NativeExpressions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val decl = docs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    native.foreach { case (id, fp) => assert(fp == decl(id), s"doc $id") }
  }

  test("TextProfile == the four declarative text functions on real docs " +
    "plus adversarial strings") {
    // adversarial rows alongside the corpus: empty, whitespace-only,
    // unicode (zh counts as punct in the ASCII regex classes), an
    // astral emoji (TWO UTF-16 units → two punct matches but ONE code
    // point of length), digits, stopword-dense text, nulls
    val extra = Seq(
      (9001L, ""), (9002L, "   \t\n  "), (9003L, "的 是 了 在 和"),
      (9004L, "café résumé 😀 ok"),
      (9005L, "12345 67 8"), (9006L, "the of and to in is that it a an"),
      (9007L, "el la los las de y es un una que"),
      (9008L, null.asInstanceOf[String]),
      (9009L, "a.b,c;d:e!f?g"), (9010L, "le la les de et est un une"))
      .toDF("doc_id", "text")
    val all = docs.select(col("doc_id"), col("text")).union(extra)
    val native = all.select(col("doc_id"),
      NativeExpressions.textProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p.n_tokens"), col("p.n_bpe"),
        col("p.lang_pred"), col("p.quality_micros"))
      .as[(Long, Option[Int], Option[Int], Option[String], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val decl = all.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("nt"),
      TextFunctions.bpeTokenCountApprox(col("text")).as("nb"),
      TextFunctions.langId(col("text")).as("lg"),
      TextFunctions.qualityScoreMicros(col("text")).as("qm"))
      .as[(Long, Option[Int], Option[Int], Option[String], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(native.keySet == decl.keySet)
    native.foreach { case (id, p) => assert(p == decl(id), s"doc $id") }
  }

  test("CosineSim == declarative cosine, bit-exact, on embedding pairs") {
    val a = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.filter(col("vec_id").between(50, 99))
      .select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b)
    val native = pairs.select(col("ia"), col("ib"),
      NativeExpressions.cosine(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val decl = pairs.select(col("ia"), col("ib"),
      VectorFunctions.cosine(col("va"), col("vb")).as("c"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    native.foreach { case (k, c) => assert(c == decl(k), s"pair $k") }
  }

  test("HyperplaneSig == declarative hyperplane signature") {
    val native = emb.select(col("vec_id"),
      NativeExpressions.hyperplaneSignature(col("embedding"), 64, 16).as("s"))
      .as[(Long, Long)].collect().toMap
    val decl = emb.select(col("vec_id"),
      VectorFunctions.hyperplaneSignature(col("embedding"), 64, 16).as("s"))
      .as[(Long, Long)].collect().toMap
    native.foreach { case (id, s) => assert(s == decl(id), s"vec $id") }
  }

  test("SQL registration: kernels callable from spark.sql") {
    NativeExpressions.register(spark)
    docs.limit(10).createOrReplaceTempView("ndocs")
    val out = spark.sql(
      """SELECT doc_id, graft_fingerprint(text) AS fp,
        |graft_simhash(text) AS sh, size(graft_minhash(text)) AS nsig,
        |graft_text_profile(text).lang_pred AS lang,
        |graft_minhash_from_hashes(graft_shingle_set(text)) AS sig2,
        |graft_minhash(text) AS sig1
        |FROM ndocs""".stripMargin).collect()
    assert(out.length == 10)
    assert(out.forall(_.getInt(3) == 32))
    // the set-derived signature matches the text-derived one in SQL too
    assert(out.forall(r => r.getSeq[Long](4 + 1) == r.getSeq[Long](4 + 2)))
  }

  test("ShingleHashSet/SortedJaccard agree with declarative shingle-set jaccard") {
    val sets = docs.select(col("doc_id"),
      NativeExpressions.shingleHashSet(col("text")).as("hs"),
      array_distinct(TextFunctions.shingles(col("text"))).as("ss"))
    // hash-set cardinality == string-set cardinality (no collisions here)
    sets.collect().foreach { r =>
      assert(r.getSeq[Long](1).size == r.getSeq[String](2).size,
        s"doc ${r.getLong(0)}")
    }
    val a = sets.select(col("doc_id").as("ia"), col("hs").as("ha"), col("ss").as("sa"))
    val b = sets.select(col("doc_id").as("ib"), col("hs").as("hb"), col("ss").as("sb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib")).limit(2000)
    val diffs = pairs.select(
      NativeExpressions.sortedJaccard(col("ha"), col("hb")).as("jh"),
      Dedup.jaccardFromSets(col("sa"), col("sb")).as("js"))
      .collect().map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(diffs.forall(_ < 1e-9))
  }

  test("vector kernels match declarative forms on short/empty/mismatched vectors") {
    val df = Seq(
      (1L, Seq(1f, 2f), Seq(1f, 2f, 3f)),   // length mismatch
      (2L, Seq.empty[Float], Seq.empty[Float]), // empty
      (3L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))   // normal
    ).toDF("id", "a", "b")
    val both = df.select(col("id"),
      NativeExpressions.cosine(col("a"), col("b")).as("nc"),
      VectorFunctions.cosine(col("a"), col("b")).as("dc")).collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    val sigs = df.select(col("id"),
      NativeExpressions.hyperplaneSignature(col("a"), 3, 8).as("ns"),
      VectorFunctions.hyperplaneSignature(col("a"), 3, 8).as("ds")).collect()
    sigs.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}")
    }
  }

  test("null inputs yield null, not crashes") {
    val df = Seq(Some("hello world"), None).toDF("t")
    val out = df.select(
      NativeExpressions.fingerprint(col("t")).as("fp"),
      NativeExpressions.simhash(col("t")).as("sh")).collect()
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("kernels survive codegen with fallback DISABLED — the real " +
    "doGenCode path compiles and evaluates (not a silent interpreted " +
    "fallback)") {
    // spark.sql.codegen.fallback=false turns a broken generated class
    // from a silent slow path into a test failure; running EVERY
    // kernel under it pins that the NativeKernels static-call bridge
    // actually compiles through Janino
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val extra = Seq((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, ""), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val textKernels = docs.select(col("doc_id"), col("text"))
        .union(extra)
        .select(col("doc_id"),
          NativeExpressions.minhashSignature(col("text")).as("mh"),
          NativeExpressions.minhashFromHashes(
            NativeExpressions.shingleHashSet(col("text"))).as("mh2"),
          NativeExpressions.simhash(col("text")).as("sh"),
          NativeExpressions.fingerprint(col("text")).as("fp"),
          NativeExpressions.normalizeText(col("text")).as("norm"),
          NativeExpressions.textProfile(col("text")).as("prof"),
          NativeExpressions.jaroWinkler(col("text"), col("text")).as("jw"),
          NativeExpressions.sortedJaccard(
            NativeExpressions.shingleHashSet(col("text")),
            NativeExpressions.shingleHashSet(col("text"))).as("jac"))
      assert(textKernels.count() == docs.count() + 3)
      // non-null text must self-match under JW and self-jaccard 1.0
      val row = textKernels.filter(col("doc_id") === 1L).head()
      assert(row.getAs[Double]("jw") == 1.0 && row.getAs[Double]("jac") == 1.0)
      val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
      val vecKernels = emb.select(col("vec_id"),
        NativeExpressions.cosine(col("embedding"), col("embedding"))
          .as("cos"),
        NativeExpressions.hyperplaneSignature(col("embedding"),
          dim = emb.selectExpr("size(embedding)").head().getInt(0))
          .as("hp"))
      assert(vecKernels.filter(col("cos") > 0.999).count() == emb.count())
      assert(vecKernels.count() == emb.count())
      val nc = emb.limit(8).select(NativeExpressions.nearestCentroids(
        col("embedding"), centroids, 2).as("nc")).collect()
      assert(nc.forall(_.getSeq[Int](0).length == 2))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
