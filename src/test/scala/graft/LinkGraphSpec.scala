package graft

import org.apache.spark.sql.functions.col

import graft.operators.LinkGraph

/** Ground truth for integer-micros PageRank: the distributed operator
  * must reproduce, exactly, a 10-line reference fold over the same
  * recurrence — floors and all.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** The documented recurrence, computed serially. */
  private def reference(edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / outdeg(u) }.sum).toMap
      pr = nodes.map(v => v -> (150000L + 85L * in.getOrElse(v, 0L) / 100L))
        .toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pageRankMicros(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRankMicros == the serial recurrence on a mixed graph " +
    "(hub, chain, dangling sink, self-loop, parallel edge)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), // hub out
      (2, 1), (3, 1), // back-links
      (4, 5), (5, 6), // chain into 6, which is DANGLING (mass drops)
      (7, 7), // self-loop
      (2, 1)) // parallel edge: counts twice
    for (iters <- Seq(1, 3, 7))
      assert(run(edges, iters) == reference(edges, iters),
        s"divergence at iters=$iters")
  }

  test("authority orders as expected: a node every page links beats " +
    "the periphery, and the result is deterministic across reruns") {
    val edges = (1L to 20L).map(i => (i, 0L)) ++ Seq((0L, 1L))
    val a = run(edges, 3)
    val b = run(edges, 3)
    assert(a == b)
    assert(a(0L) > a(2L), "the universally-linked node must rank higher")
    assert(a == reference(edges, 3))
  }

  test("iteration leaves no cache residue and an empty edge list " +
    "yields an empty result") {
    assert(LinkGraph.pageRankMicros(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 2).collect().isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("personalizedPageRank: teleport mass lands only on seeds, " +
    "trust decays with link distance, unlinked nodes score zero") {
    // directed chain 0->1->2->3->4 plus an isolated pair 10->11,
    // seeded at 0: trust must decay strictly along the chain and the
    // disconnected component must end at zero
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val a = graft.operators.LinkGraph
      .personalizedPageRankMicros(edges, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = graft.operators.LinkGraph
      .personalizedPageRankMicros(edges, seeds, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "must be deterministic")
    assert(a(0L) == 150000L, "seed keeps exactly the teleport floor " +
      "(nothing links to it)")
    // nodes 1 and 2 have converged after 3 rounds (the initial-mass
    // wave has passed them; node 3 still carries it) — decay must
    // hold on the converged prefix, and trust must have REACHED 3
    assert(a(1L) > a(2L) && a(2L) > 0 && a(3L) > 0,
      s"trust must decay along the converged chain prefix: $a")
    assert(a(10L) == 0L && a(11L) == 0L,
      "no trust path -> zero (raw PageRank would give both the floor)")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // seed hygiene: a dirty seed list (dups + nulls) must score
    // identically to the clean one — without the dedupe, seed 0's row
    // duplicates through the join and its mass doubles
    val dirty = Seq(Some(0L), Some(0L), None).toDF("id")
    val c = graft.operators.LinkGraph
      .personalizedPageRankMicros(edges, dirty, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(c == a, s"duplicate/null seeds must not inflate scores: $c vs $a")
  }

  test("hopDistance: BFS layers from a seed set, bounded hops, " +
    "unreachable nodes absent, shortest distance wins") {
    // path 1-2-3-4-5 plus a cycle 10-11-12-10 seeded at both 1 and 12:
    // node 3 is 2 hops from seed 1; 11 is 1 hop from seed 12 (not 2
    // via 10); 5 is 4 hops away -> absent at maxHops=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L, 12L).toDF("id")
    val got = graft.operators.LinkGraph.hopDistance(edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L,
      12L -> 0L, 10L -> 1L, 11L -> 1L), s"got $got")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("bipartiteProject: co-occurrence counts, duplicate edges " +
    "collapse, hub contexts drop whole at the degree cap") {
    // ctx 1: items {10, 20, 30}; ctx 2: {10, 20} (10 duplicated);
    // ctx 3 is a hub with 4 items — dropped at maxDegree = 3
    val edges = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L), (3L, 40L))
      .toDF("ctx", "it")
    val got = LinkGraph.bipartiteProject(edges, "ctx", "it", maxDegree = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)),
      s"got $got")
    // without the cap the hub contributes its pairs (incl. item 40)
    val uncapped = LinkGraph.bipartiteProject(edges, "ctx", "it",
      maxDegree = 100)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.contains((10L, 40L, 1L)) &&
      uncapped.contains((10L, 20L, 3L)))
    // pair orientation: every pair appears exactly once, item_a < item_b
    assert(uncapped.forall(p => p._1 < p._2))
  }

  test("labelPropagation: bridged cliques stay distinct communities " +
    "(where CC merges them), duplicate edges don't double votes, " +
    "partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    // two 5-cliques {0..4} and {10..14} joined by ONE bridge 0–10
    val cl = (for {
      base <- Seq(0L, 10L)
      i <- 0 until 5; j <- i + 1 until 5
    } yield (base + i, base + j)) :+ ((0L, 10L))
    val e = cl.toDF("src", "dst")
    val got = graft.operators.LinkGraph.labelPropagation(e, iters = 4)
      .as[(Long, Long)].collect().toMap
    val comm0 = (0L until 5L).map(got).toSet
    val comm1 = (10L until 15L).map(got).toSet
    assert(comm0.size == 1 && comm1.size == 1,
      s"cliques fragmented: $got")
    assert(comm0 != comm1,
      s"bridge merged the cliques (that's CC, not LPA): $got")
    // CC control: the same graph IS one component
    val cc = graft.operators.Dedup.connectedComponents(
      e.select(col("src").as("id_a"), col("dst").as("id_b")))
      .select(col("component")).distinct().count()
    assert(cc == 1L, "construction broke: bridge should connect CC")
    // duplicate + reversed edges must not change the vote
    val doubled = e.union(e).union(e.select(col("dst").as("src"),
      col("src").as("dst")))
    val got2 = graft.operators.LinkGraph
      .labelPropagation(doubled, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got2 == got, "parallel/reversed edges changed the result")
    // partitioning invariance
    val got3 = graft.operators.LinkGraph
      .labelPropagation(e.repartition(7), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got3 == got)
  }

  /** The documented HITS recurrence, computed serially: per round,
    * raw authority = Σ hub over in-edges (multiplicity counts),
    * max-normalize to micros; then raw hub = Σ authority over
    * out-edges, max-normalize. Floors and all.
    */
  private def hitsReference(edges: Seq[(Long, Long)],
                            iters: Int): Map[Long, (Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val mx = math.max(raw.values.foldLeft(0L)(math.max), 1L)
      nodes.map(v => v -> raw.getOrElse(v, 0L) * 1000000L / mx).toMap
    }
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      a = norm(edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => h(u) }.sum).toMap)
      h = norm(edges.groupBy(_._1).view.mapValues(
        _.map { case (_, v) => a(v) }.sum).toMap)
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("hitsMicros == the serial recurrence (hub page, cited sink, " +
    "dangling, parallel edges); top scores pin at exactly 1e6") {
    val edges = Seq[(Long, Long)](
      (1, 10), (2, 10), (3, 10), // 10 is the authority
      (1, 11), (2, 11), // 11 second authority
      (10, 20), // authorities can point on
      (4, 10), (4, 10), // parallel endorsement counts twice
      (5, 6)) // periphery
    for (iters <- Seq(1, 3)) {
      val got = LinkGraph.hitsMicros(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == hitsReference(edges, iters), s"divergence at iters=$iters")
    }
    val got = LinkGraph.hitsMicros(edges.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // semantics: 10 is the top authority (pinned at 1e6); the nodes
    // endorsing BOTH authorities are the top hubs; the dangling sink
    // holds hub exactly 0; a pure authority holds what its out-edge earns
    assert(got(10L)._2 == 1000000L, "top authority must pin at 1e6")
    assert(got.values.map(_._1).max == 1000000L, "top hub must pin at 1e6")
    // node 4's parallel endorsement of the top authority (2 × a(10))
    // outweighs the dual endorsers' a(10)+a(11) — multiplicity counts
    assert(got(4L)._1 == 1000000L,
      "the double-endorser of the top authority must be the top hub")
    assert(got(1L)._1 == got(2L)._1 && got(1L)._1 > got(3L)._1,
      "dual endorsers tie, and beat the single endorser")
    assert(got(20L)._1 == 0L, "dangling sink must hold hub 0")
    assert(got(10L)._2 > got(11L)._2, "3+ endorsements must beat 2")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "hitsMicros leaked cached plans")
  }
}
