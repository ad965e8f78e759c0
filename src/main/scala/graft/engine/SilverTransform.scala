package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze → silver transform + the silver analysis query.
  *
  * Re-expresses `2_Silver_Notebook.py:33-75`:
  *  - `model_category = split(Model_ID, '-')[0]`           (`:33`)
  *  - `Rev_Per_unit   = Revenue / Units_Sold`              (`:49`)
  *    (int / int → double under Spark division semantics; div-by-zero
  *    yields null, unreachable on reference data where Units_Sold∈{1,2,3})
  *  - analysis: groupBy(BranchName, Year).sum(Units_Sold),
  *    sort Year asc, total desc                            (`:63`)
  *
  * All pure built-in expressions → whole-stage codegen'd, column-pruned,
  * and shuffle-minimal (one hash-partial + final aggregate exchange for
  * the analysis query, one range exchange for its global sort). Nothing
  * here collects to the driver.
  */
object SilverTransform {

  /** The two derived columns; stacked withColumns collapse into one
    * Project under Catalyst's CollapseProject rule.
    */
  def transform(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("model_category", split(col("Model_ID"), "-").getItem(0))
      .withColumn("Rev_Per_unit", col("Revenue") / col("Units_Sold"))

  /** `2_Silver:63` — grouped sum with mixed-direction global sort. */
  def unitsByBranchYear(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("BranchName"), col("Year"))
      .agg(sum(col("Units_Sold")).as("Total_Units_Sold"))
      .orderBy(col("Year").asc, col("Total_Units_Sold").desc)

  /** Persist silver — parquet overwrite, unpartitioned directory
    * (`2_Silver:72-75`; the reference does not partitionBy and neither
    * do we — same file-layout semantics).
    */
  def writeSilver(silver: DataFrame, path: String): Unit =
    silver.write.format("parquet").mode("overwrite").save(path)
}
