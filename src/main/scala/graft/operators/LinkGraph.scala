package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the crawl-prioritization signal of a
  * web-scale corpus pipeline (CommonCrawl ranks hosts by centrality to
  * decide what to fetch and what to keep; per-domain authority also
  * feeds quality weighting at curation time, composing with
  * [[graft.functions.UrlFunctions.registeredDomain]] for a
  * domain-level graph).
  *
  * PageRank here is computed in EXACT INTEGER MICRO-UNITS: every
  * division floors, so the iteration sequence is reproducible
  * bit-for-bit in any engine — the DuckDB oracle unrolls the same
  * recurrence in SQL and must agree exactly, which no floating-point
  * formulation survives (parallel sum order would drift the low bits).
  *
  *   pr_0(v)    = 1,000,000
  *   pr_t+1(v)  = 150,000 + (85 · Σ_{(u,v)∈E} (pr_t(u) div outdeg(u))) div 100
  *
  * (damping 0.85; a node's score is its share of followed links plus
  * the teleport floor). Dangling mass — score at nodes with no
  * out-edges — is DROPPED, not redistributed (the common simplified
  * variant); callers who need mass conservation add self-loops to
  * dangling nodes before calling.
  *
  * Execution shape at scale: outdeg is joined onto the edge list ONCE
  * and materialized; each iteration is then one join (ranks onto the
  * degree-annotated edges), one aggregation (in-mass per target), and
  * one left join back to the node set — all equi-joins on the node id,
  * shuffle-partitioned identically round to round. Each round's ranks
  * materialize to scratch parquet and the previous round drops
  * (NOTES lesson 7: iterative plans must truncate lineage), so the
  * plan depth and cache footprint stay O(1) in the iteration count.
  */
object LinkGraph {

  /** PageRank in integer micros over an edge list. Returns
    * `(id, pr_micros)` for every node appearing as an endpoint.
    * int64 bounds: safe while `85 · N · 1e6` fits a long — i.e. any
    * graph under ~10^11 nodes.
    */
  def pageRankMicros(edges: DataFrame, iters: Int = 3,
                     srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame =
    pageRankCore(edges, None, iters, srcCol, dstCol, "id")

  /** The shared iterate/materialize/drop loop behind
    * [[pageRankMicros]] and [[personalizedPageRankMicros]]: the two
    * rankers differ ONLY in the teleport indicator `s` (1 everywhere
    * for uniform PageRank; the seed flag for the personalized form),
    * which scales both the initial mass and the per-round floor —
    * `s = 1` reduces the recurrence to the plain one term for term,
    * so the uniform oracle stays bit-exact through the shared path.
    */
  private def pageRankCore(edges: DataFrame, seeds: Option[DataFrame],
                           iters: Int, srcCol: String, dstCol: String,
                           seedCol: String): DataFrame = {
    require(iters >= 1 && iters <= 100, s"unreasonable iters: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))

    // outdeg annotated once; node set = all endpoints (isolated nodes
    // don't exist in an edge list by definition). The seed flag joins
    // on ONCE (broadcast — seed lists are small by definition)
    val (eDeg, eDegScratch) = Materialize.viaScratchWithPath(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("od")), "src"),
      "graft-pr-edges")
    val nodesBase = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val (nodes, nodesScratch) = Materialize.viaScratchWithPath(
      seeds match {
        case None => nodesBase.select(col("id"), lit(1L).as("s"))
        case Some(sd) => nodesBase
          // Seed hygiene (mirrors hopDistance): a duplicate seed id
          // would duplicate that node's row through this join —
          // multiplying its initial mass and per-round teleport floor
          // — and a null id can never match an endpoint; dedupe and
          // null-filter BEFORE the broadcast so the public API is safe
          // regardless of caller discipline.
          .join(broadcast(sd.select(col(seedCol).as("id"))
            .filter(col("id").isNotNull).distinct()
            .select(col("id"), lit(1L).as("__seed"))), Seq("id"), "left")
          .select(col("id"), coalesce(col("__seed"), lit(0L)).as("s"))
      },
      "graft-pr-nodes")

    var ranks = nodes.select(col("id"), (col("s") * 1000000L).as("pr"))
    var prev: Option[Materialize.Scratch] = None
    var it = 0
    while (it < iters) {
      val inMass = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst"), expr("pr div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      val next = nodes.join(inMass, nodes("id") === inMass("dst"), "left")
        .select(nodes("id"),
          expr("s * 150000L + (85L * coalesce(m, 0L)) div 100L").as("pr"))
      val (mat, scratch) = Materialize.viaScratchWithPath(next,
        "graft-pr-ranks")
      prev.foreach(_.drop())
      prev = Some(scratch)
      ranks = mat
      it += 1
    }
    eDegScratch.drop()
    nodesScratch.drop()
    ranks.select(col("id"), col("pr").as("pr_micros"))
  }

  /** Personalized PageRank (TrustRank): identical recurrence to
    * [[pageRankMicros]] except the teleport floor lands ONLY on the
    * seed set — authority flows outward from a trusted core, so a
    * page's score measures its link proximity to trust (spam farms
    * rank high on raw PageRank but near zero here; the gap between
    * the two scores is the classic spam signal). Same exact-integer
    * contract: every division floors, the oracle unrolls the same
    * recurrence, bit-for-bit.
    *
    *   pr_0(v)   = 1,000,000 · [v ∈ S]
    *   pr_t+1(v) = 150,000 · [v ∈ S]
    *             + (85 · Σ_{(u,v)∈E} (pr_t(u) div outdeg(u))) div 100
    *
    * Execution shape is [[pageRankMicros]]'s: the seed flag joins
    * onto the node set ONCE (broadcast — seed lists are small by
    * definition), then each round is the same join + aggregation +
    * left join, scratch-materialized so plan depth stays O(1).
    */
  def personalizedPageRankMicros(edges: DataFrame, seeds: DataFrame,
                                 iters: Int = 3,
                                 srcCol: String = "src",
                                 dstCol: String = "dst",
                                 seedCol: String = "id"): DataFrame =
    pageRankCore(edges, Some(seeds), iters, srcCol, dstCol, seedCol)

  /** HITS hubs & authorities (Kleinberg 1999) in exact integer
    * micros — the query-independent link-quality pair next to
    * [[pageRankMicros]]: authority = endorsed BY good hubs, hub =
    * points AT good authorities (directory pages score as hubs, cited
    * references as authorities — both feed web-corpus curation as
    * crawl-seed and quality signals).
    *
    * Exactness: the classical L2 normalization is irrational, so each
    * half-round normalizes by the GLOBAL MAX instead — `x·1e6 div
    * max(x)` in pure int64 (max-normalized HITS converges to the same
    * principal eigenvector direction; scores land in [0, 1e6] with the
    * top node pinned at exactly 1e6). The max is one scalar aggregate
    * per half-round — bounded driver metadata, the §2-A2 category —
    * collected, LOUDLY bound-checked (raw·1e6 must fit int64: raw sums
    * n·1e6-scale terms, so indegree beyond ~9.2e6 would overflow — the
    * KN/LogReg loud-envelope convention, never a silent wrap), and
    * re-injected as a literal so the division stays engine-exact.
    *
    * Parallel edges count with multiplicity (a multigraph endorsement
    * is worth its copies; dedupe upstream if not). Each half-round is
    * ONE equi-join + grouped sum, scratch-materialized for O(1) plan
    * depth ([[pageRankCore]]'s loop discipline); nodes without
    * in-edges (out-edges) hold authority (hub) exactly 0.
    */
  def hitsMicros(edges: DataFrame, iters: Int = 3,
                 srcCol: String = "src",
                 dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 100, s"unreasonable iters: $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val (e, eScratch) = Materialize.viaScratchWithPath(e0, "graft-hits-edges")
    val (nodes, nodesScratch) = Materialize.viaScratchWithPath(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct(),
      "graft-hits-nodes")

    // normalize a raw-score table to micros against its own max; the
    // collect is ONE scalar (bounded driver metadata)
    def normalized(raw: DataFrame): DataFrame = {
      val mx = raw.agg(coalesce(max(col("raw")), lit(0L))).head().getLong(0)
      require(mx <= Long.MaxValue / 1000000L,
        s"HITS raw score $mx would overflow micros scaling — " +
          "indegree/hub mass beyond the int64 envelope; shard or " +
          "pre-aggregate the graph")
      val d = math.max(mx, 1L)
      nodes.join(raw, nodes("id") === raw("nid"), "left")
        .select(nodes("id"),
          expr(s"(coalesce(raw, 0L) * 1000000L) div ${d}L").as("score"))
    }

    var hubs = nodes.select(col("id"), lit(1000000L).as("score"))
    var auths: DataFrame = null
    var prevScratches = List.empty[Materialize.Scratch]
    var it = 0
    while (it < iters) {
      val rawA = e.join(hubs, e("src") === hubs("id"))
        .groupBy(e("dst").as("nid")).agg(sum(col("score")).as("raw"))
      val (matA, sA) = Materialize.viaScratchWithPath(rawA, "graft-hits-a")
      val a = normalized(matA)
      val rawH = e.join(a, e("dst") === a("id"))
        .groupBy(e("src").as("nid")).agg(sum(col("score")).as("raw"))
      val (matH, sH) = Materialize.viaScratchWithPath(rawH, "graft-hits-h")
      val h = normalized(matH)
      prevScratches.foreach(_.drop())
      prevScratches = List(sA, sH)
      auths = a
      hubs = h
      it += 1
    }
    val out = hubs.select(col("id"), col("score").as("hub_micros"))
      .join(auths.select(col("id"), col("score").as("auth_micros")),
        Seq("id"))
    // materialize the result BEFORE dropping the scratches it reads
    val (res, _) = Materialize.viaScratchWithPath(out, "graft-hits-out")
    prevScratches.foreach(_.drop())
    eScratch.drop()
    nodesScratch.drop()
    res
  }

  /** Per-node triangle participation over an undirected view of the
    * edge list — the local-clustering signal (link farms and mutual-
    * citation rings triangle-count far above organic pages, so this
    * feeds spam scoring next to [[pageRankMicros]]'s authority).
    *
    * Classic degree-ordered orientation: normalize to distinct
    * undirected edges (self-loops and parallel/reverse duplicates
    * dropped), orient each edge from the (degree, id)-smaller endpoint
    * to the larger, join wedges u→v→w on the middle node, then
    * semi-join the closing edge u→w. Every triangle {u,v,w} is counted
    * EXACTLY once (its unique orientation-ordered traversal), and the
    * orientation bounds wedge fan-out by each node's HIGHER-ordered
    * degree — O(m^1.5) total work even on power-law graphs, where the
    * unoriented wedge join is Σ deg² (hub-quadratic).
    *
    * Scale shape: degree table once (one agg), two hash equi-joins on
    * node keys, one explode + count. Exact integers throughout — the
    * `q_g_triangles` oracle replays the identical joins.
    */
  def triangleCounts(edges: DataFrame,
                     srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    // (degree, id) total order; orient a→b in that order
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u").as("v"), col("v").as("w")), "v")
    val triangles = wedges.join(
      oriented.select(col("u"), col("v").as("w")), Seq("u", "w"), "left_semi")
    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** BFS hop distance from a seed set over an undirected view of the
    * edge list — crawl depth from the seed list, link distance from a
    * trusted core (the TrustRank-style provenance signal), blast
    * radius of a takedown. Returns `(id, hops)` for every node within
    * `maxHops` of a seed (seeds at 0); unreachable nodes are absent.
    *
    * Frontier BFS with per-round scratch materialization (NOTES
    * lesson 7: iterative plans must truncate lineage): each round is
    * ONE equi-join of the frontier onto the neighbor map, an
    * anti-join against the settled set, and a union — all keyed on
    * the node id, shuffle-partitioned identically round to round.
    * Work per round ∝ edges incident to the frontier, total ∝ m·1
    * (each edge relaxes at most twice) — hub degrees only widen a
    * round, never square it.
    */
  def hopDistance(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                  srcCol: String = "src", dstCol: String = "dst",
                  seedCol: String = "id"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 100, s"unreasonable maxHops: $maxHops")
    val (und, undScratch) = Materialize.viaScratchWithPath(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
        .filter(col("u") =!= col("v") &&
          col("u").isNotNull && col("v").isNotNull)
        .distinct(),
      "graft-bfs-edges")
    // seed hygiene: null seeds can't anchor a layer and a duplicated
    // seed id must not emit two hops-0 rows (only `next` is deduped —
    // a dirty seed list would ride every union verbatim)
    var dist = seeds.select(col(seedCol).as("id"), lit(0L).as("hops"))
      .filter(col("id").isNotNull).distinct()
    var frontier = dist.select(col("id"))
    val scratches = scala.collection.mutable.ListBuffer.empty[Materialize.Scratch]
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = frontier.join(und, frontier("id") === und("u"))
        .select(und("v").as("id")).distinct()
        .join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("hops"))
      val (mat, s) = Materialize.viaScratchWithPath(dist.union(next),
        "graft-bfs-dist")
      scratches += s
      dist = mat
      frontier = mat.filter(col("hops") === h).select(col("id"))
      // an empty frontier can never grow again — stop instead of
      // paying (maxHops − h) empty join rounds; the count reads the
      // just-materialized parquet, one cheap metadata-sized job
      exhausted = frontier.limit(1).isEmpty
      h += 1
    }
    // pin the final layer before dropping the per-round scratches the
    // plan reads from
    val pinned = Materialize.viaScratch(dist, "graft-bfs-out")
    scratches.foreach(_.drop())
    undScratch.drop()
    pinned
  }

  /** Bipartite co-occurrence projection: from (context, item) edges,
    * count for every item pair how many contexts contain both — the
    * market-basket / co-click similarity graph (parts bought in the
    * same order, docs read in the same session, tokens sharing a
    * window).
    *
    * Scale contract: pair volume is Σ_ctx deg(ctx)², which ONE hub
    * context can blow up quadratically (a crawler session touching
    * 10^6 pages yields 10^12 pairs on its own). `maxDegree` caps the
    * context degree BEFORE the self-join — hub contexts are dropped
    * whole (a context with more items than the cap carries almost no
    * pairwise signal anyway; its pairs are noise, exactly like
    * stop-grams in the trigram join). With the cap, pair volume is
    * ≤ maxDegree · |E|: linear in the edge list at any corpus size.
    * Execution is distinct → degree filter → ONE self-equi-join on
    * the context key → pair aggregation; no cartesian, no broadcast
    * of anything unbounded.
    */
  def bipartiteProject(edges: DataFrame, ctxCol: String, itemCol: String,
                       maxDegree: Long = 1000L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val e = edges.select(col(ctxCol).as("__ctx"), col(itemCol).as("__it"))
      .filter(col("__ctx").isNotNull && col("__it").isNotNull)
      .distinct()
    val kept = e.join(
      e.groupBy(col("__ctx")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") <= maxDegree)
        .select(col("__ctx")),
      Seq("__ctx"))
    kept.select(col("__ctx"), col("__it").as("item_a"))
      .join(kept.select(col("__ctx"), col("__it").as("item_b")),
        Seq("__ctx"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** SYNCHRONOUS label-propagation community detection (LPA) —
    * communities, not components: where [[graft.operators.Dedup
    * .connectedComponents]]' min-label propagation merges everything
    * a single bridge connects, LPA's FREQUENCY vote keeps densely-
    * linked groups distinct (a clique out-votes its one bridge edge).
    * The domain-clustering / topic-grouping signal of a link corpus.
    *
    * Determinism is the design constraint (classic async LPA depends
    * on visit order — useless for an oracle): every round, every node
    * simultaneously adopts the most frequent label among its
    * neighbors, ties broken by the SMALLER label, for exactly `iters`
    * rounds from `label = own id`. The K-round state is a pure
    * function of the edge set, replayed by the oracle's unrolled
    * CTEs. Parallel edges are deduplicated first — a doubled edge
    * must not double its vote.
    *
    * Execution: per round ONE equi-join (edge map × labels) + a
    * (node, label) count + a struct-max argmax (never a window over
    * the corpus), scratch-materialized per round (NOTES lesson 7:
    * O(1) plan depth). Work per round ∝ edges, like the PageRank
    * loop.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 4,
                       srcCol: String = "src",
                       dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 100, s"unreasonable iters: $iters")
    val dir0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .filter(col("s") =!= col("d"))
    val (und, undScratch) = Materialize.viaScratchWithPath(
      dir0.union(dir0.select(col("d").as("s"), col("s").as("d")))
        .distinct(),
      "graft-lpa-edges")
    val (nodes, nodesScratch) = Materialize.viaScratchWithPath(
      und.select(col("s").as("id")).distinct(), "graft-lpa-nodes")
    var labels = nodes.select(col("id"), col("id").as("lab"))
    var prev: Option[Materialize.Scratch] = None
    var it = 0
    while (it < iters) {
      val votes = und
        .join(labels.select(col("id").as("d"), col("lab")), "d")
        .groupBy(col("s"), col("lab"))
        .agg(count(lit(1)).as("n"))
      // argmax (n desc, lab asc) as ONE struct-max aggregation — the
      // q_d_keep_best shape; -lab makes the lexicographic max pick
      // the smaller label on vote ties
      val best = votes
        .groupBy(col("s").as("id"))
        .agg(max(struct(col("n"), (-col("lab")).as("nl"))).as("b"))
        .select(col("id"), (-col("b.nl")).as("lab"))
      val (mat, scratch) = Materialize.viaScratchWithPath(best,
        "graft-lpa-labels")
      prev.foreach(_.drop())
      prev = Some(scratch)
      labels = mat
      it += 1
    }
    undScratch.drop()
    nodesScratch.drop()
    labels.select(col("id"), col("lab").as("community"))
  }
}
