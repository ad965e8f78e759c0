package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked planar distance self-join: all point pairs within a
  * radius, without the all-pairs cross join. The geo-dedup primitive of
  * a crawl pipeline (co-located businesses, duplicate place pages,
  * sensor-reading clusters) and the same blocking idea the dedup family
  * uses for text (LSH buckets) applied to coordinates.
  *
  * Mechanism: bucket the plane into radius-sized cells; a pair within
  * distance r must live in adjacent cells, so probe-side points
  * explode into their 3×3 cell neighborhood and equi-join the build
  * side's home cell. Each unordered pair is found EXACTLY once — the
  * build point has one home cell and the `id_a < id_b` half-plane
  * keeps one orientation — so no post-join distinct is needed.
  *
  * Scale shape: 9× row expansion on one side, ONE hash-shuffle
  * equi-join on the cell key, then an exact integer distance² filter.
  * Never a cross join, never a theta-join (Spark would nested-loop
  * it). Skew: a dense cell costs |cell|² — at 100 TB pick the cell
  * size so the densest cell stays bounded (the radius is the floor;
  * smaller cells mean more neighbor probes, larger mean fatter
  * cells), and cap or salt known hot spots upstream the way the LSH
  * generators cap buckets.
  *
  * Coordinates and radius are exact integers (micro-units); distance²
  * stays in int64 (|dx|,|dy| ≤ 2³¹ safe), so results are
  * engine-exact — the `q_g_spatial` oracle replays the identical
  * blocking in SQL.
  */
object SpatialJoin {

  /** All pairs with (x,y) integer coordinates within `radius`
    * (euclidean, inclusive). Output: (id_a, id_b, dist2) with
    * id_a < id_b and dist2 = dx² + dy² ≤ radius².
    */
  def gridSelfJoin(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val r = lit(radius)
    val neighbors = array(lit(-1L), lit(0L), lit(1L))
    val probe = points
      .select(col(idCol).as("id_a"), col(xCol).as("xa"), col(yCol).as("ya"))
      .withColumn("__dx", explode(neighbors))
      .withColumn("__dy", explode(neighbors))
      .select(col("id_a"), col("xa"), col("ya"),
        (expr(s"xa div $radius") + col("__dx")).as("__cx"),
        (expr(s"ya div $radius") + col("__dy")).as("__cy"))
    val build = points
      .select(col(idCol).as("id_b"), col(xCol).as("xb"), col(yCol).as("yb"))
      .withColumn("__cx", expr(s"xb div $radius"))
      .withColumn("__cy", expr(s"yb div $radius"))
    probe.join(build, Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
