package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal 0, identical 1, opposite -1, zero-vec null") {
    val df = Seq(
      ("orth", Seq(1f, 0f), Seq(0f, 1f)),
      ("same", Seq(1f, 2f), Seq(1f, 2f)),
      ("opp", Seq(1f, 0f), Seq(-1f, 0f)),
      ("zero", Seq(0f, 0f), Seq(1f, 1f))
    ).toDF("k", "a", "b")
      .select(col("k"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(df("orth") == 0.0)
    assert(math.abs(df("same").asInstanceOf[Double] - 1.0) < 1e-12)
    assert(df("opp") == -1.0)
    assert(df("zero") == null)
  }

  test("bruteForceTopK: rank 1 is the true nearest neighbor (manual check)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = SimilaritySearch.bruteForceTopK(emb,
      emb.filter(col("vec_id") === 0), k = 3).collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3)) // ranks dense
    // recompute the winner by scanning all cosines
    val best = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))))
      .select(col("vec_id"),
        VectorFunctions.cosine(col("qv"), col("embedding")).as("c"))
      .orderBy(col("c").desc).limit(1).head
    assert(got.head.getLong(2) == best.getLong(0))
  }

  test("lshTopK achieves reasonable recall@5 against brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64,
        nBits = 16, maxHamming = 7)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("topKMatryoshka: exhaustive shortlist equals brute force " +
    "exactly; a bounded prefix shortlist holds useful recall at a " +
    "fraction of the scoring FLOPs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val n = emb.count().toInt
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = SimilaritySearch.topKMatryoshka(emb, q, k = 5,
        prefixDims = 4, shortlistK = n)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == exact,
      s"exhaustive-shortlist MRL must be exact:\n missing=${
        exact -- full}\n extra=${full -- exact}")
    // recall floor measured on THIS corpus: random embeddings are
    // MRL's worst case (no matryoshka training ⇒ signal spread
    // uniformly over dims, a 4/16 prefix is just a 4-dim random
    // projection — measured 0.38 at shortlist 64, 0.58 at 128);
    // trained MRL embeddings concentrate variance in the prefix and
    // sit far above this floor. The pin guards the mechanism, not
    // the embedding quality.
    val approx = SimilaritySearch.topKMatryoshka(emb, q, k = 5,
        prefixDims = 4, shortlistK = 128)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exactIds = exact.map(r => (r._1, r._3))
    val recall = exactIds.intersect(approx).size.toDouble / exactIds.size
    info(f"MRL recall@5 (prefix 4 of 16, shortlist 128 of $n): $recall%.3f")
    assert(recall >= 0.5, s"prefix shortlist recall too low: $recall")
  }

  test("signPack/hammingPacked == scalar replay (multi-word vectors " +
    "included); binTopK recall@5 measured against brute force") {
    import graft.functions.NativeExpressions.{signPack, hammingPacked}
    val rnd = new scala.util.Random(17)
    // 130 dims → 3 packed words, last one partial
    val vecs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(130)((rnd.nextGaussian() * 0.3).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val packed = df.select(col("vec_id"), signPack(col("embedding")))
      .as[(Long, Array[Long])].collect().toMap
    vecs.foreach { case (id, v) =>
      val expect = new Array[Long]((v.length + 63) / 64)
      v.zipWithIndex.foreach { case (x, i) =>
        if (x > 0f) expect(i >> 6) |= (1L << (i & 63))
      }
      assert(packed(id).toSeq == expect.toSeq, s"pack $id")
    }
    val hams = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        hammingPacked(signPack(col("a.embedding")),
          signPack(col("b.embedding"))))
      .as[(Long, Long, Int)].collect()
    hams.foreach { case (ia, ib, h) =>
      val va = vecs(ia.toInt)._2; val vb = vecs(ib.toInt)._2
      val expect = va.zip(vb).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(h == expect, s"hamming($ia,$ib)")
    }
    // recall of the 64-candidate binary shortlist on the real corpus
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val bin = SimilaritySearch.binTopK(emb, q, k = 5, shortlistK = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(bin).size.toDouble / exact.size
    info(f"binTopK recall@5 at 64-candidate shortlist: $recall%.3f")
    assert(recall >= 0.5, s"binary shortlist recall too low: $recall")
  }

  test("positives: every result shares the query's label, never the " +
    "query itself, and is disjoint from hardNegatives; truncTopK " +
    "recall@5 measured at the 16-dim prefix") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Long)].collect().toMap
    val pos = SimilaritySearch.positives(emb, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    assert(pos.nonEmpty)
    pos.foreach { case (qid, nid) =>
      assert(nid != qid)
      assert(labels(nid) == labels(qid), s"label mismatch $qid -> $nid")
    }
    val neg = SimilaritySearch.hardNegatives(emb, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(pos.toSet.intersect(neg).isEmpty,
      "a pair cannot be both positive and hard negative")
    // Matryoshka prefix shortlist recall at equal budget
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val trunc = SimilaritySearch.truncTopK(emb, q, k = 5, dims = 16,
        shortlistK = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(trunc).size.toDouble / exact.size
    info(f"truncTopK recall@5, 16-of-64-dim prefix @64 shortlist: $recall%.3f")
    assert(recall >= 0.5, s"prefix shortlist recall too low: $recall")
  }

  test("lshTopK exhaustive mode (maxHamming >= nBits) == bruteForceTopK " +
    "row-for-row (the probe-all-buckets escape hatch behind the " +
    "q_v_topk_lsh oracle)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(_.toSeq).toSet
    val hatch = SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64,
        nBits = 16, maxHamming = 16)
      .collect().map(_.toSeq).toSet
    assert(hatch == exact,
      s"exhaustive LSH diverged from brute force: ${hatch.size} vs ${exact.size}")
  }

  test("bandPlan: cheapest (bands, subRadius) still covers the full Hamming ball") {
    // the pigeonhole guarantee, checked exhaustively: every XOR pattern
    // with popcount <= maxHamming must have SOME band within subRadius
    for (nBits <- Seq(8, 12, 16); maxHamming <- 0 until nBits) {
      val (b, t) = SimilaritySearch.bandPlan(nBits, maxHamming)
      val r = nBits / b
      val mask = (1L << r) - 1
      (0L until (1L << nBits)).foreach { x =>
        if (java.lang.Long.bitCount(x) <= maxHamming) {
          val hit = (0 until b).exists { j =>
            java.lang.Long.bitCount((x >> (j * r)) & mask) <= t
          }
          assert(hit, s"nBits=$nBits maxHamming=$maxHamming plan=($b,$t) misses x=$x")
        }
      }
    }
    // the gate/default config collapses 14,893 ball probes to 8 band probes
    assert(SimilaritySearch.bandPlan(16, 6) == (8, 0))
    assert(SimilaritySearch.bandPlan(16, 7) == (8, 0))
  }

  test("lshTopK banded candidates are a superset of the exact Hamming ball " +
    "(planted duplicate is always found)") {
    // identical vectors share every band bucket -> guaranteed candidate;
    // top-1 of a planted exact copy must be the copy (cosine 1.0)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.union(
      emb.filter(col("vec_id") < 10).withColumn("vec_id", col("vec_id") + 5000L))
    val got = SimilaritySearch.lshTopK(planted,
        planted.filter(col("vec_id") >= 5000L), k = 1, dim = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { i =>
      assert(got(i + 5000L) == i, s"planted copy of $i not its own top-1: $got")
    }
  }

  test("cosineNearDupPairs (LSH) finds what the exact path finds, at high threshold") {
    // plant exact duplicates so near-dup pairs exist at threshold ~1
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val planted = emb.union(emb.withColumn("vec_id", col("vec_id") + 1000L))
    val exact = SimilaritySearch.cosineNearDupPairsExact(planted, 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = SimilaritySearch.cosineNearDupPairs(planted, 0.999, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact) // identical vectors share every bucket → full recall
  }

  test("decontaminateSemantic flags exactly the corpus rows with a " +
    "benchmark twin; disjoint benchmark flags nothing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // benchmark = copies of every 7th corpus vector (different ids)
    val bench = emb.filter(col("vec_id") % 7 === 3)
      .withColumn("vec_id", col("vec_id") + 500000L)
    val flagged = SimilaritySearch
      .decontaminateSemantic(emb, bench, threshold = 0.8, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    val want = emb.filter(col("vec_id") % 7 === 3)
      .select("vec_id").as[Long].collect().toSet
    assert(flagged == want,
      s"flag set != planted twins: extra=${flagged -- want} " +
        s"missing=${want -- flagged}")
    // a benchmark with nothing similar flags nothing (threshold above
    // this corpus's natural cosine ceiling)
    val ortho = Seq((1L, Seq.fill(63)(0f) :+ 1000f)).toDF(
      "vec_id", "embedding")
    assert(SimilaritySearch
      .decontaminateSemantic(emb, ortho, threshold = 0.8, dim = 64)
      .count() == 0)
  }

  test("cosineNearDupStats accounts for skew-cap drops; gate corpus clean") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 50 identical vectors → one bucket of 50 in each of the 4 bands
    val one = emb.filter(col("vec_id") === 0).select(col("embedding")).head
      .getSeq[Float](0)
    val skew = (1L to 50L).map(i => (i, one)).toDF("vec_id", "embedding")
    val s = SimilaritySearch.cosineNearDupStats(skew, dim = 64,
      maxBucketSize = 10)
    assert(s.droppedBuckets == 4)
    assert(s.droppedPairs == 4L * (50L * 49L / 2))
    // the q_v_neardup gate corpus under the gate parameters: clean
    val planted = emb.select(col("vec_id"), col("embedding"))
      .union(emb.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding")))
    val g = SimilaritySearch.cosineNearDupStats(planted, dim = 64,
      nBits = 32, bands = 4)
    assert(g.droppedBuckets == 0 && g.droppedPairs == 0,
      s"q_v_neardup silently drops pairs: $g")
  }

  test("withQuantizedInt8: int8 range, dequantization error ≤ half a step") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = VectorFunctions.withQuantizedInt8(emb, "embedding")
      .select(col("embedding"), col("q8"), col("q_scale")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getSeq[Float](0)
      val q = r.getSeq[Int](1)
      val scale = r.getDouble(2)
      assert(q.forall(v => v >= -127 && v <= 127))
      // dequantized value within half a quantization step of the input
      x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(qi * scale / 127.0 - xi) <= scale / 254.0 + 1e-9)
      }
    }
    // all-zero vector → zeros, not NaN/null
    val z = Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    assert(VectorFunctions.withQuantizedInt8(z, "embedding")
      .select("q8").head.getSeq[Int](0) == Seq(0, 0))
  }

  test("cosineNearDupPairs leaves no persisted blocks in the session") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SimilaritySearch.cosineNearDupPairs(emb, 0.999, dim = 64).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("semanticDedup: planted copies resolve to originals; transitive " +
    "chains keep ONE survivor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // two copies of every vector → components {v, v+1M, v+2M}: the CC
    // resolution must collapse each to the single original, never
    // "one survivor per overlapping pair"
    val planted = emb
      .union(emb.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding")))
      .union(emb.select((col("vec_id") + 2000000L).as("vec_id"),
        col("embedding")))
    val kept = SimilaritySearch.semanticDedup(planted, threshold = 0.9,
      k = 8).select("vec_id").as[Long].collect().sorted
    assert(kept.length == n, s"${kept.length} kept, expected $n")
    assert(kept.forall(_ < 1000000L), "a planted copy survived")
  }

  test("semanticDupPairs: recall vs the exact path on perturbed copies " +
    "(within-cluster contract)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // near- (not exact-) copies: flip the sign of one coordinate's
    // low-magnitude tail by scaling element 0 slightly
    val perturbed = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        (x, i) => when(i === 0, x * 1.05f).otherwise(x))
        .cast("array<float>").as("embedding"))
    val planted = emb.union(perturbed)
    val exact = SimilaritySearch
      .cosineNearDupPairsExact(planted, threshold = 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sem = SimilaritySearch
      .semanticDupPairs(planted, threshold = 0.98, k = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "perturbation too large — no ground-truth pairs")
    // SemDeDup only examines same-cluster pairs; near-identical vectors
    // nearly always co-cluster, so recall should be high but the
    // contract is "≥ 0.9 on near-copies", not 1.0
    val recall = sem.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9")
    assert(sem.subsetOf(exact), "semanticDupPairs produced a non-pair")
  }

  test("centroid gate: exact-micros sums agree with the double " +
    "vector-sum path within per-element rounding") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val micros = emb
      .select((col("vec_id") % 8).as("grp"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(org.apache.spark.sql.functions
          .round(col("x").cast("double") * 1000000).cast("long"))
          .as("sm"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val doubles = emb
      .select((col("vec_id") % 8).as("grp"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(col("x").cast("double")).as("s")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    micros.foreach { case (k, (sm, n)) =>
      // each element contributes ≤ 0.5 micro of quantization error
      assert(math.abs(sm - doubles(k) * 1e6) <= 0.5 * n + 1.0,
        s"$k: micros $sm vs double ${doubles(k)}")
    }
  }

  test("randomProjection: bit-identical to a local left-to-right fold " +
    "of the derived matrix; linear in its input") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    // one query computes BOTH projections — same rows guaranteed
    // (limit without an ordering may differ across jobs)
    val got = emb.select(col("vec_id"), col("embedding"),
        VectorFunctions.randomProjection(col("embedding"), 16).as("proj"),
        VectorFunctions.randomProjection(
          org.apache.spark.sql.functions.transform(col("embedding"),
            x => x * 2.0f).cast("array<float>"), 16).as("proj2"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val v = r.getSeq[Float](1)
      val proj = r.getSeq[Double](2)
      val local = (0 until 16).map { j =>
        var acc = 0.0
        var i = 0
        while (i < v.length) {
          val w = java.lang.Math.floorMod(
            i.toLong * 2654435761L + j.toLong * 40503L, 65536L)
            .toDouble / 65536.0 - 0.5
          acc += v(i).toDouble * w
          i += 1
        }
        acc
      }
      assert(proj == local, s"vec ${r.getLong(0)}: engine $proj vs $local")
    }
    // linearity: proj(2v) == 2*proj(v) exactly (scaling by a power of
    // two is exact in binary floating point)
    got.foreach { r =>
      val twice = r.getSeq[Double](2).map(_ * 2.0)
      assert(r.getSeq[Double](3) == twice, "projection not linear")
    }
    // empty vector projects to zeros, never nulls
    import spark.implicits._
    val z = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
      .select(VectorFunctions.randomProjection(col("embedding"), 4))
      .head.getSeq[Double](0)
    assert(z == Seq(0.0, 0.0, 0.0, 0.0), s"empty vector gave $z")
  }

  test("autoBandPlan: occupancy-pinned rows grow with log n, candidate " +
    "budget stays linear, rows always fit a long") {
    val plans = Seq(2000L, 40000L, 800000L, 16000000L, 1L << 40)
      .map(n => n -> SimilaritySearch.autoBandPlan(n, threshold = 0.8))
    val rowsSeq = plans.map { case (_, (nBits, bands)) => nBits / bands }
    assert(rowsSeq == rowsSeq.sorted, "rows per band must grow with n")
    assert(rowsSeq.forall(r => r >= 4 && r <= 20))
    plans.foreach { case (n, (nBits, bands)) =>
      assert(bands >= 2 && bands <= 16, s"bands out of range at n=$n")
      assert(nBits % bands == 0)
      // expected bucket occupancy at most ~2× the 32 target once rows
      // stop being clamped at the minimum
      val rows = nBits / bands
      if (rows < 20) assert(n.toDouble / math.pow(2, rows) <= 64.0,
        s"occupancy unpinned at n=$n: ${n.toDouble / math.pow(2, rows)}")
    }
  }

  test("cosineNearDupPairsAuto finds planted identical pairs (they " +
    "collide in every band at any plan)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.union(emb.select((col("vec_id") + 1000000L)
      .as("vec_id"), col("embedding")))
    val got = SimilaritySearch
      .cosineNearDupPairsAuto(planted, threshold = 0.999, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val n = emb.count()
    val expected = (0L until n).map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(got),
      s"missing ${(expected -- got).take(5)} of ${expected.size}")
  }

  test("autoClusterK pins occupancy between 16 and the 4096 cap; " +
    "semanticDedupAuto resolves planted copies like the fixed-k path") {
    assert(SimilaritySearch.autoClusterK(100) == 16)
    assert(SimilaritySearch.autoClusterK(40000) == 157)
    assert(SimilaritySearch.autoClusterK(100000000L) == 4096)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.union(emb.select((col("vec_id") + 1000000L)
      .as("vec_id"), col("embedding")))
    val kept = SimilaritySearch
      .semanticDedupAuto(planted, threshold = 0.999, iters = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == emb.select("vec_id").as[Long].collect().toSet,
      "every planted copy dropped, every original kept")
  }

  test("semanticDedupHierarchical: planted copies resolve to originals " +
    "under forced salt fan-out; assignment is partition-invariant") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.union(emb.select((col("vec_id") + 1000000L)
      .as("vec_id"), col("embedding")))
    // maxLocal 64 with ~400 rows over coarseK=4 forces multi-salt
    // groups: identical copies must STILL share (coarse, salt, sub)
    val kept = SimilaritySearch.semanticDedupHierarchical(planted,
        threshold = 0.999, targetClusterSize = 16, coarseK = 4,
        maxLocal = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == emb.select("vec_id").as[Long].collect().toSet,
      "every planted copy dropped, every original kept")
    // clusters are a deterministic function of content, not layout
    val c1 = SimilaritySearch.hierarchicalClusters(planted,
        targetClusterSize = 16, coarseK = 4, maxLocal = 64)
      .select(col("vec_id"), struct(col("coarse"), col("salt"),
        col("sub")).as("c"))
      .as[(Long, (Int, Int, Int))].collect().toMap
    val c2 = SimilaritySearch.hierarchicalClusters(planted.repartition(7),
        targetClusterSize = 16, coarseK = 4, maxLocal = 64)
      .select(col("vec_id"), struct(col("coarse"), col("salt"),
        col("sub")).as("c"))
      .as[(Long, (Int, Int, Int))].collect().toMap
    assert(c1 == c2, "hierarchical assignment must not depend on layout")
    (0L until 10L).foreach { i =>
      assert(c1(i) == c1(i + 1000000L), s"copy of $i split from original")
    }
  }

  test("localCosineKMeans: identical vectors co-assign, k>=n degenerates " +
    "to identity-ish, deterministic across calls") {
    val vs = Array(
      Array(1f, 0f), Array(0f, 1f), Array(1f, 0f),
      Array(0.9f, 0.1f), Array(0f, 0f))
    val a1 = SimilaritySearch.localCosineKMeans(vs, 2)
    val a2 = SimilaritySearch.localCosineKMeans(vs, 2)
    assert(a1.toSeq == a2.toSeq)
    assert(a1(0) == a1(2), "identical vectors must share a cluster")
    assert(a1(0) == a1(3), "0.995-cosine neighbor joins the same centroid")
    assert(a1(0) != a1(1), "orthogonal vectors split at k=2")
    val big = SimilaritySearch.localCosineKMeans(vs, 10)
    assert(big.length == 5)
    assert(SimilaritySearch.localCosineKMeans(Array.empty, 3).isEmpty)
  }

  test("semanticDupStats accounts for capped clusters; healthy k is clean") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clean = SimilaritySearch.semanticDupStats(emb, k = 8)
    assert(clean.droppedBuckets == 0 && clean.droppedPairs == 0)
    val capped = SimilaritySearch.semanticDupStats(emb, k = 2,
      maxClusterSize = 3)
    assert(capped.droppedBuckets > 0, "tiny cap must trip the guard")
  }

  test("rrf fusion: cross-list agreement dominates, ties break by id, " +
    "self-fusion doubles, topN trims per query") {
    import graft.operators.Fusion
    def ranking(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("q_id", "n_id", "rank")
    // doc 30 is rank 3 in BOTH lists; docs 10/20 are rank 1 in ONE —
    // two third-places must outscore a single first place at k0=60
    val a = ranking((1L, 10L, 1), (1L, 30L, 3))
    val b = ranking((1L, 20L, 1), (1L, 30L, 3))
    val fused = Fusion.rrf(Seq(a, b), topN = 3)
      .select(col("fused_rank"), col("n_id"), col("n_lists"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(fused.map(f => (f._1, f._2)).toSeq ==
      Seq((1, 30L), (2, 10L), (3, 20L)),
      s"agreement must dominate; id breaks the 10-vs-20 tie: ${fused.toSeq}")
    assert(fused.find(_._2 == 30L).get._3 == 2)
    // self-fusion: exactly double the single-list scores
    val once = Fusion.rrf(Seq(a)).select(col("n_id"), col("rrf_micros"))
      .as[(Long, Long)].collect().toMap
    val twice = Fusion.rrf(Seq(a, a)).select(col("n_id"), col("rrf_micros"))
      .as[(Long, Long)].collect().toMap
    assert(twice == once.map { case (k, v) => k -> v * 2 })
  }

  test("mmrSelect spreads across planted clusters where top-k collapses " +
    "into one") {
    import spark.implicits._
    // three tight clusters along distinct axes; relevance reference
    // slightly favors cluster 0 — plain top-3 would take all of
    // cluster 0, MMR must take one per cluster
    def v(axis: Int, eps: Float): Seq[Float] = {
      val a = Array.fill(6)(0.01f)
      a(axis) = 1.0f
      a((axis + 3) % 6) += eps
      a.toSeq
    }
    val rows = (for {
      c <- 0 until 3
      m <- 0 until 3
    } yield ((c * 3 + m).toLong, v(c, 0.001f * m))).toDF("vec_id", "embedding")
    val ref = Array.fill(6)(0.4f)
    ref(0) = 0.6f // cluster-0 bias
    val picks = graft.operators.SimilaritySearch
      .mmrSelect(rows, ref.toSeq, k = 3)
      .select("vec_id").as[Long].collect().toSet
    val clusters = picks.map(_ / 3)
    assert(clusters == Set(0L, 1L, 2L),
      s"MMR must take one per cluster, took $picks")
    // greedy margins are non-increasing: the winner of step i+1 was
    // available at step i with at-most that margin, and adding a
    // selection can only raise the similarity penalty
    val margins = graft.operators.SimilaritySearch
      .mmrSelect(rows, ref.toSeq, k = 3)
      .orderBy("step").select("margin_micros").as[Long].collect()
    assert(margins.sliding(2).forall { case Array(a, b) => a >= b },
      s"greedy margins should not increase: ${margins.toSeq}")
  }

  test("sq8TopK: int8-quantized ranking recovers the exact float " +
    "top-5 at high recall and is deterministic across partitionings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 16)
    val exact = SimilaritySearch.bruteForceTopK(emb, queries, k = 5)
    val sq8 = SimilaritySearch.sq8TopK(emb, queries, k = 5)
    val rec = SimilaritySearch.recallAtK(exact, sq8)
      .agg(sum(col("n_hit")), sum(col("n_exact"))).head()
    val recall = rec.getLong(0).toDouble / rec.getLong(1)
    // int8 over 64 dims keeps ~1% relative score error — the top-5
    // should survive almost everywhere. Floor at 0.85, log the value
    assert(recall >= 0.85, s"sq8 recall@5 $recall")
    info(s"sq8 recall@5 = $recall")
    val a = sq8.collect().map(_.toSeq).toSet
    val b = SimilaritySearch.sq8TopK(emb.repartition(13), queries, k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("splitLeaks: blocked result equals the brute-force cross " +
    "relation at the duplicate threshold; every planted exact copy " +
    "maps to exactly its source; negated vectors never leak") {
    import org.apache.spark.sql.functions.transform
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val test = emb.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") % 20 === 10)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    val blocked = SimilaritySearch.splitLeaks(emb, test, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // brute force: plain cross join + cosine, no blocking
    val brute = test.select(col("vec_id").as("test_id"),
        col("embedding").as("__qv"))
      .crossJoin(emb.select(col("vec_id").as("train_id"),
        col("embedding").as("__tv")))
      .select(col("test_id"), col("train_id"),
        org.apache.spark.sql.functions.round(
          graft.functions.NativeExpressions.cosine(
            col("__qv"), col("__tv")), 6).as("cosine"))
      .filter(col("cosine") >= 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == brute,
      s"blocked != brute: missing=${brute -- blocked} extra=${blocked -- brute}")
    // every leak is (source + 1e6, source, 1.0); negated ids absent
    assert(blocked.forall { case (te, tr, c) =>
      te == tr + 1000000L && c == 1.0
    }, s"unexpected pairs: $blocked")
    val nLeaks = emb.filter(col("vec_id") % 20 === 0).count()
    assert(blocked.size.toLong == nLeaks,
      s"${blocked.size} leaks vs $nLeaks planted")
  }
}
