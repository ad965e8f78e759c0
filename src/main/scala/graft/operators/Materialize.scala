package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Pin a result that is small relative to its inputs (a near-dup pair
  * list, a candidate id table) through a scratch parquet directory: one
  * write action now, then a plain scan. The returned frame holds no
  * reference to the producing plan, so an enclosing persist bracket can
  * unpersist its intermediates before returning — the operator leaves
  * ZERO residue in the session's cache manager (CacheHygieneSpec pins
  * `getPersistentRDDs.isEmpty` after every driver query).
  *
  * This is also what a production pipeline does at 100 TB: the pair
  * list of a dedup pass is persisted as a table for the downstream
  * delete/keep join, never recomputed from the corpus.
  *
  * Scratch location: `graft.scratch.dir` (Spark conf) if set, else the
  * driver's java.io.tmpdir. On a real cluster the conf MUST name a
  * cluster-visible path (HDFS/object store) — a driver-local default
  * only works in local mode, which is why everything here goes through
  * the Hadoop FileSystem API, never java.nio. Every scratch dir is
  * registered for recursive deletion at JVM exit, and iterative
  * callers (connectedComponents) drop superseded rounds eagerly via
  * [[Scratch.drop]], so a long-lived session's footprint is the live
  * results, not the history.
  */
private[graft] object Materialize {

  /** A scratch dir and the filesystem it lives on. */
  final case class Scratch(fs: FileSystem, dir: Path) {
    def drop(): Unit = {
      created.remove(this)
      try fs.delete(dir, true)
      catch { case _: java.io.IOException => () }
    }
  }

  private val created =
    java.util.Collections.synchronizedSet(
      new java.util.LinkedHashSet[Scratch]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.synchronized {
      created.forEach(s =>
        try s.fs.delete(s.dir, true)
        catch { case _: java.io.IOException => () })
    }
  }))

  /** Materialize `df` into a fresh scratch dir; returns the re-read. */
  def viaScratch(df: DataFrame, prefix: String): DataFrame =
    viaScratchWithPath(df, prefix)._1

  /** As [[viaScratch]], also returning the handle so iterative callers
    * can [[Scratch.drop]] superseded rounds eagerly.
    */
  def viaScratchWithPath(df: DataFrame,
                         prefix: String): (DataFrame, Scratch) = {
    val spark = df.sparkSession
    val root = new Path(spark.conf.get("graft.scratch.dir",
      System.getProperty("java.io.tmpdir")))
    val dir = new Path(root, s"$prefix-${java.util.UUID.randomUUID()}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val handle = Scratch(fs, dir)
    created.add(handle)
    val out = new Path(dir, "out").toString
    df.write.mode("overwrite").parquet(out)
    (spark.read.parquet(out), handle)
  }
}
