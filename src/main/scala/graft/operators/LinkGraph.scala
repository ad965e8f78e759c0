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
                     dstCol: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 100, s"unreasonable iters: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))

    // outdeg annotated once; node set = all endpoints (isolated nodes
    // don't exist in an edge list by definition)
    val (eDeg, eDegScratch) = Materialize.viaScratchWithPath(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("od")), "src"),
      "graft-pr-edges")
    val (nodes, nodesScratch) = Materialize.viaScratchWithPath(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct(),
      "graft-pr-nodes")

    var ranks = nodes.select(col("id"), lit(1000000L).as("pr"))
    var prev: Option[Materialize.Scratch] = None
    var it = 0
    while (it < iters) {
      val inMass = eDeg.join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst"), expr("pr div od").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      val next = nodes.join(inMass, nodes("id") === inMass("dst"), "left")
        .select(nodes("id"),
          expr("150000L + (85L * coalesce(m, 0L)) div 100L").as("pr"))
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
}
