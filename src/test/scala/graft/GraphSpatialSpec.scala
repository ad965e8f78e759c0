package graft

import org.apache.spark.sql.functions._

import graft.operators.{Anonymize, LinkGraph, SpatialJoin}

/** Ground truth for the batch-3 graph/spatial/privacy operators:
  * grid-blocked radius join vs brute force, triangle counting vs a
  * serial enumerator, and the k-anonymity ladder's full level range
  * (including the -1 suppression the corpus gate never reaches).
  */
class GraphSpatialSpec extends SparkSpec {

  // ── SpatialJoin ─────────────────────────────────────────────────────

  test("gridSelfJoin matches brute force on a random point set") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
    val r = 150L
    val want = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts if i < j
      d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
      if d2 <= r * r
    } yield (i, j, d2)).toSet
    val got = SpatialJoin
      .gridSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "degenerate test corpus")
  }

  test("gridSelfJoin: pairs exactly on the radius are kept, beyond dropped") {
    import spark.implicits._
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 6L, 0L))
      .toDF("id", "x", "y")
    // d(1,2) = 5 (kept at r=5), d(1,3) = 6 (dropped), d(2,3) = sqrt(25)=5
    val got = SpatialJoin.gridSelfJoin(pts, "id", "x", "y", 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 25L), (2L, 3L, 25L)))
  }

  test("gridSelfJoin finds pairs straddling cell boundaries") {
    import spark.implicits._
    // radius 10: cells [0,10), [10,20) — points at 9 and 11 straddle
    val pts = Seq((1L, 9L, 9L), (2L, 11L, 11L)).toDF("id", "x", "y")
    val got = SpatialJoin.gridSelfJoin(pts, "id", "x", "y", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L)))
  }

  // ── LinkGraph.triangleCounts ────────────────────────────────────────

  private def triangles(
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
  }

  test("triangles: K4 has 3 per node; appendages add none") {
    // K4 on {1,2,3,4} = 4 triangles, each node in 3; pendant 5-1
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(triangles(k4 :+ (5L, 1L)) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: direction, duplicates and self-loops are normalized away") {
    // same triangle given as mixed directions + dupes + a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 2L))
    assert(triangles(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: random graph matches a serial enumerator") {
    val rnd = new scala.util.Random(23)
    val n = 40
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextInt(5) == 0
    } yield (a, b)).toSeq
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val want = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(b) if adj(a).contains(c)) {
      want(a) += 1; want(b) += 1; want(c) += 1
    }
    assert(triangles(edges) == want.toMap)
    assert(want.nonEmpty, "degenerate test graph")
  }

  // ── Anonymize ───────────────────────────────────────────────────────

  test("k-anonymity ladder: every level including suppression") {
    import spark.implicits._
    // zip codes: 6 rows share (z,a) → level 0 at k=3; 2 rows share z
    // only → level 1; one unique row → -1 with a 2-level ladder
    val rows = Seq(
      (1L, "94110", 30), (2L, "94110", 30), (3L, "94110", 30),
      (4L, "94110", 31), (5L, "94110", 32), (6L, "94110", 33),
      (7L, "10001", 40), (8L, "10001", 41), (9L, "73301", 50))
      .toDF("id", "zip", "age")
    val lvls = Anonymize.kAnonymityLevels(rows,
        Seq(Seq(col("zip"), col("age")), Seq(col("zip"))), k = 3L)
      .select("id", "anon_level")
      .as[(Long, Int)].collect().toMap
    assert(lvls == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
      6L -> 1, 7L -> -1, 8L -> -1, 9L -> -1))
    // release filter: maxLevel 1 keeps the first six rows only
    val kept = Anonymize.kAnonymize(rows,
        Seq(Seq(col("zip"), col("age")), Seq(col("zip"))), k = 3L,
        maxLevel = 1)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("k-anonymity counts each level over ALL rows (documented contract)") {
    import spark.implicits._
    // 2 rows at (z,a)=(x,1) fail level 0 at k=3, but level-1 count
    // includes the level-0-satisfied rows of the same zip
    val rows = Seq((1L, "x", 1), (2L, "x", 1), (3L, "x", 2), (4L, "x", 2),
      (5L, "x", 2)).toDF("id", "zip", "age")
    val lvls = Anonymize.kAnonymityLevels(rows,
        Seq(Seq(col("zip"), col("age")), Seq(col("zip"))), k = 3L)
      .select("id", "anon_level").as[(Long, Int)].collect().toMap
    assert(lvls == Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 0))
  }

  test("l-diversity: homogeneous groups fail however large, NULL " +
    "sensitive values never count, the release filter keeps diverse " +
    "groups (null quasi keys included)") {
    import spark.implicits._
    val rows = Seq(
      // group (10001): 4 rows but ONE disease — k-anonymous, not diverse
      (1L, "10001", "flu"), (2L, "10001", "flu"),
      (3L, "10001", "flu"), (4L, "10001", "flu"),
      // group (10002): 3 rows, 3 diseases — diverse at l=3
      (5L, "10002", "flu"), (6L, "10002", "cold"), (7L, "10002", "covid"),
      // group (10003): nulls don't count — 1 real value → fails
      (8L, "10003", "flu"), (9L, "10003", null),
      // null-zip group: 3 distinct values → diverse, and the release
      // filter must keep it (null-safe key join)
      (10L, null, "a"), (11L, null, "b"), (12L, null, "c"))
      .toDF("id", "zip", "disease")
    val g = Anonymize.lDiversityGroups(rows, Seq(col("zip")),
        col("disease"), l = 3L)
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(g(Some("10001")) == ((4L, 1L, false)),
      "homogeneity attack: big group, one value must fail")
    assert(g(Some("10002")) == ((3L, 3L, true)))
    assert(g(Some("10003")) == ((2L, 1L, false)),
      "NULL sensitive must not count as a value")
    assert(g(None) == ((3L, 3L, true)))
    val kept = Anonymize.lDiversify(rows, Seq(col("zip")),
        col("disease"), l = 3L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(5L, 6L, 7L, 10L, 11L, 12L),
      s"release filter wrong: $kept")
  }

  test("entropy l-diversity: a skewed group passes distinct-l but " +
    "fails entropy; uniform-3 sits exactly at the threshold") {
    import spark.implicits._
    // skewed: 8×a + b + c — 3 distinct values (passes distinct l=3)
    // but H = .8·ln1.25 + 2·(.1·ln10) → 178515+230259+230259 = 639033
    // micros < ln3·1e6 = 1098612 → entropy FAILS it
    // uniform: 2×a + 2×b + 2×c → 3·round(1e6·ln3/3) = 1098612 ≥
    // threshold (exactly the boundary, and it must PASS)
    val rows = (Seq.fill(8)(("S", "a")) ++ Seq(("S", "b"), ("S", "c")) ++
      Seq(("U", "a"), ("U", "a"), ("U", "b"), ("U", "b"),
        ("U", "c"), ("U", "c")))
      .toDF("zip", "disease")
    val dist = Anonymize.lDiversityGroups(rows, Seq(col("zip")),
        col("disease"), l = 3L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(dist("S") && dist("U"), "both pass the distinct form")
    val ent = Anonymize.entropyLDiversityGroups(rows, Seq("zip"),
        col("disease"), l = 3L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(ent("S") == ((639033L, false)),
      s"skewed group must fail entropy: ${ent("S")}")
    assert(ent("U") == ((1098612L, true)),
      s"uniform-3 is exactly the threshold and passes: ${ent("U")}")
  }

  test("entropy l-diversity: a NULL quasi group is audited, never " +
    "silently dropped by the internal joins") {
    import spark.implicits._
    // the null-zip group is uniform-3 (must pass at the threshold);
    // a null-unsafe join would make it vanish from the audit output
    val rows = (Seq((Some("10001"), "a"), (Some("10001"), "b"),
      (Some("10001"), "c")) ++
      Seq("a", "a", "b", "b", "c", "c").map(v => (None, v)))
      .toDF("zip", "disease")
    val ent = Anonymize.entropyLDiversityGroups(rows, Seq("zip"),
        col("disease"), l = 3L)
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(ent.keySet == Set(Some("10001"), None),
      s"the NULL quasi group must appear in the audit: ${ent.keySet}")
    assert(ent(None) == ((6L, 1098612L, true)),
      s"uniform-3 null group sits at the threshold: ${ent(None)}")
    assert(ent(Some("10001"))._3,
      "uniform-3 named group passes like the null one")
  }

  test("t-closeness: a group that PASSES distinct l-diversity still " +
    "fails when its sensitive distribution diverges from the corpus " +
    "(the skewness attack); exact integer EMD") {
    import spark.implicits._
    // domain {0,1,2}, m=3. Anchor group C: uniform 10/10/10 (n=30).
    // Skewed group B: 6/1/1 (n=8) — 3 distinct values, so distinct
    // l-diversity at l=3 PASSES it. Corpus: 16/11/11, N=38.
    // Hand-computed exact prefixes P_i = Σ(n_gj·N − N_j·n_g):
    //   B: P1 = 6·38−16·8 = 100; P2 = 100 + (38−88) = 50 → Σ|P|=150
    //      EMD = 150/(2·8·38) = 150/608 → 246710 micros (truncating)
    //   C: P1 = 380−480 = −100; P2 = −100+50 = −50 → Σ|P|=150
    //      EMD = 150/(2·30·38) = 150/2280 → 65789 micros
    val rows = (Seq.tabulate(30)(i => ("C", (i % 3).toLong)) ++
      (Seq.fill(6)(0L) ++ Seq(1L, 2L)).map(v => ("B", v)))
      .toDF("zip", "sev")
    val ldiv = Anonymize.lDiversityGroups(rows, Seq(col("zip")),
        col("sev"), l = 3L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(ldiv("B") && ldiv("C"), "both groups pass distinct l=3")
    val tc = Anonymize.tClosenessGroups(rows, Seq("zip"), col("sev"),
        tMicros = 200000L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(tc("B") == ((8L, 246710L, false)),
      s"skewed-but-diverse group must fail t=0.2: ${tc("B")}")
    assert(tc("C") == ((30L, 65789L, true)),
      s"anchor group sits near the corpus: ${tc("C")}")
  }

  test("tCloseRelease: rows of close groups survive, far groups " +
    "drop, and an unauditable (all-null-sensitive) group is NOT " +
    "released") {
    import spark.implicits._
    val rows = (Seq.tabulate(30)(i => ("C", Some((i % 3).toLong))) ++
      (Seq.fill(6)(0L) ++ Seq(1L, 2L)).map(v => ("B", Some(v))) ++
      Seq(("G", None), ("G", None)))
      .toDF("zip", "sev")
    val kept = Anonymize.tCloseRelease(rows, Seq("zip"), col("sev"),
        tMicros = 200000L)
      .groupBy("zip").count().as[(String, Long)].collect().toMap
    assert(kept == Map("C" -> 30L),
      s"only the close group's rows release: $kept")
  }

  test("t-closeness edge cases: one-value domain reads EMD 0; NULL " +
    "sensitive drops; NULL quasi group is audited") {
    import spark.implicits._
    val one = Seq(("A", Some(1L)), ("A", Some(1L)), ("B", Some(1L)),
      ("B", None)).toDF("zip", "sev")
    val got1 = Anonymize.tClosenessGroups(one, Seq("zip"), col("sev"),
        tMicros = 0L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got1("A") == ((2L, 0L, true)) && got1("B") == ((1L, 0L, true)),
      s"one-value domain must read EMD 0 everywhere: $got1")
    val nq = (Seq.tabulate(6)(i => (Some("Z"), (i % 3).toLong)) ++
      Seq.tabulate(6)(i => (None, (i % 3).toLong)))
      .toDF("zip", "sev")
    val got2 = Anonymize.tClosenessGroups(nq, Seq("zip"), col("sev"),
        tMicros = 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(3)).toMap
    assert(got2.keySet == Set(Some("Z"), None),
      s"NULL quasi group must be audited: ${got2.keySet}")
    assert(got2(None) && got2(Some("Z")),
      "both groups mirror the corpus exactly → EMD 0 passes t=0")
  }

  test("categorical t-closeness: equal-distance EMD = TVD ignores " +
    "WHERE the mass moved (near ≡ far), ordered EMD charges for " +
    "distance — the divergence that decides which form fits the " +
    "attribute; exact integers on both") {
    import spark.implicits._
    // domain {0..4}. C: 6 each (n=30). NEAR moves one row 0→1,
    // FAR moves one row 0→4 (both n=10, counts (1,3,2,2,2) and
    // (1,2,2,2,3)). Corpus: (8,11,10,10,11), N=50. Hand-computed:
    //   TVD numerators: NEAR 30+40+0+0+10 = 80 = FAR 30+10+0+0+40
    //     → both 80·1e6/(2·10·50) = 80000 micros — TVD is blind to
    //     the move's distance by construction
    //   ordered prefixes: NEAR |−30|+|10|+|10|+|10| = 60 → 30000
    //     micros; FAR |−30|+|−40|+|−40|+|−40| = 150 → 75000 micros
    val rows = (Seq.tabulate(30)(i => ("C", (i % 5).toLong)) ++
      (Seq(0L, 1L, 1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L).map(("NEAR", _))) ++
      (Seq(0L, 1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 4L).map(("FAR", _))))
      .toDF("zip", "sev")
    val cat = Anonymize.tClosenessGroupsCat(rows, Seq("zip"),
        col("sev"), tMicros = 50000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(cat("NEAR") == ((10L, 80000L, false)) &&
      cat("FAR") == ((10L, 80000L, false)),
      s"TVD must read near and far moves identically: $cat")
    assert(cat("C") == ((30L, 40000L, true)), s"anchor: $cat")
    val ord = Anonymize.tClosenessGroups(rows, Seq("zip"),
        col("sev"), tMicros = 50000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(ord("NEAR") == ((30000L, true)) &&
      ord("FAR") == ((75000L, false)),
      s"ordered EMD must charge the far move more: $ord")
    // edge parity with the ordered form: empty corpus audits as all
    // close, NULL sensitive drops, NULL quasi groups audit
    val allNull = Seq(("A", None: Option[Long]), ("B", None))
      .toDF("zip", "sev")
    assert(Anonymize.tClosenessGroupsCat(allNull, Seq("zip"),
        col("sev"), tMicros = 0L).collect().isEmpty,
      "all-null sensitive: no auditable group rows at all")
    val nq = (Seq.tabulate(6)(i => (Some("Z"), (i % 3).toLong)) ++
      Seq.tabulate(6)(i => (None, (i % 3).toLong)))
      .toDF("zip", "sev")
    val got = Anonymize.tClosenessGroupsCat(nq, Seq("zip"),
        col("sev"), tMicros = 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getBoolean(3)).toMap
    assert(got == Map(Some("Z") -> true, None -> true),
      s"NULL quasi audits; exact corpus mirror passes t=0: $got")
  }
}
