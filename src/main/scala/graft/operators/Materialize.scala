package graft.operators

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
  * Disk lifecycle: every scratch dir is registered for recursive
  * deletion at JVM exit (`File.deleteOnExit` alone would leak them —
  * it only removes EMPTY directories), and iterative callers
  * (connectedComponents) drop superseded rounds eagerly via
  * [[dropScratch]], so a long-lived session's scratch footprint is the
  * live results, not the history.
  */
private[graft] object Materialize {

  private val created =
    java.util.Collections.synchronizedSet(
      new java.util.LinkedHashSet[java.nio.file.Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.synchronized {
      created.forEach(p => deleteRecursively(p))
    }
  }))

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount) // children before parents
        .foreach(f => try java.nio.file.Files.deleteIfExists(f)
          catch { case _: java.io.IOException => () })
    }
  }

  /** Materialize `df` into a fresh scratch dir; returns the re-read. */
  def viaScratch(df: DataFrame, prefix: String): DataFrame =
    viaScratchWithPath(df, prefix)._1

  /** As [[viaScratch]], also returning the scratch dir so iterative
    * callers can [[dropScratch]] superseded rounds eagerly.
    */
  def viaScratchWithPath(df: DataFrame,
                         prefix: String): (DataFrame, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    created.add(dir)
    val path = dir.resolve("out").toString
    df.write.mode("overwrite").parquet(path)
    (df.sparkSession.read.parquet(path), dir)
  }

  /** Delete a scratch dir created by [[viaScratchWithPath]] now (the
    * caller guarantees no plan still reads it).
    */
  def dropScratch(dir: java.nio.file.Path): Unit = {
    created.remove(dir)
    deleteRecursively(dir)
  }
}
