package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Upsert

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each re-expressed over the TPC-H-ish driver testdata
  * (TESTDATA.md) and paired with equivalent DuckDB SQL in `oracleSql`
  * for the hash-match correctness gate. Ops whose output is inherently
  * nondeterministic (monotonically_increasing_id) carry no oracle and
  * are covered by ScalaTest invariants instead.
  *
  * Conventions (keep or the driver's compare breaks):
  *  - every computed column is aliased IDENTICALLY in the Spark code
  *    and the SQL;
  *  - double aggregates are rounded to 2 decimals on both sides so
  *    summation-order ulp drift cannot flip the hash;
  *  - integer-typed derivations (year(), count) are cast so Spark and
  *    DuckDB agree on the exact integer width.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Discounted revenue in EXACT integer-cents arithmetic:
    * Σ cents(price)·(100 − cents(discount)) is an exact int64 (prices
    * and discounts are 2-decimal values), and the single final
    * division is the only floating op — so the result is bit-identical
    * in any engine and any summation order. The naive
    * `round(sum(price·(1−disc)), 2)` is a landmine: measured group
    * sums in this dataset land EXACTLY on half-cent boundaries, where
    * engines whose doubles differ by 1 ulp round to different cents.
    */
  private def discRevenue: org.apache.spark.sql.Column =
    (sum(round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))) / 10000.0)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's star-join + grouped-sum shape (J2 + A1) in one.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
           sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("revenue").desc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ StretchQueries.queries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── S1: parquet batch scan + column-pruned projection ──────────────
    "q_s1_scan_project" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"), col("p_name"),
        col("p_retailprice"))),

    // ── S2: SQL over a parquet path-table (`2_Silver:85-87`) ───────────
    "q_s2_sql_path" -> ((s, dir) =>
      s.sql(s"select distinct p_brand from parquet.`$dir/part.parquet`")),

    // ── P1/P2/F1: withColumn + split + array index (`2_Silver:33`) ─────
    "q_p2_split" -> ((s, dir) =>
      t(s, dir, "part")
        .withColumn("type_head", split(col("p_type"), " ").getItem(0))
        .select(col("p_partkey"), col("type_head"))),

    // ── P4/F3: int-free division → double (`2_Silver:49`) ──────────────
    "q_p4_div" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("price_per_unit", col("l_extendedprice") / col("l_quantity"))
        .select(col("l_orderkey"), col("l_linenumber"), col("price_per_unit"))),

    // ── P3/F5: cast to string (`2_Silver:45`) ──────────────────────────
    "q_p3_cast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_linenumber").cast("string").as("ln_str"))),

    // ── J1+P6+P7: left join, lineage-qualified select, IS NOT NULL
    //    (the SCD1 matched/old path, `3(1):79,92`) ───────────────────────
    "q_p7_scd_old" -> ((s, dir) => {
      val src = t(s, dir, "part")
      val sink = t(s, dir, "part").filter(col("p_size") > 25)
        .select(col("p_partkey").as("sink_key"))
      src.join(sink, src("p_partkey") === sink("sink_key"), "left")
        .filter(col("sink_key").isNotNull)
        .select(src("p_partkey"), src("p_name"))
    }),

    // ── J1+P8: same join, IS NULL (the new-record path, `3(1):102`) ────
    "q_p8_scd_new" -> ((s, dir) => {
      val src = t(s, dir, "part")
      val sink = t(s, dir, "part").filter(col("p_size") > 25)
        .select(col("p_partkey").as("sink_key"))
      src.join(sink, src("p_partkey") === sink("sink_key"), "left")
        .filter(col("sink_key").isNull)
        .select(src("p_partkey"), src("p_name"))
    }),

    // ── P9+P10: constant-false schema-only query (`3(1):63-68`) ────────
    "q_p9_schema_only" -> ((s, dir) =>
      s.sql(s"select 1 as dim_key, p_partkey, p_name " +
        s"from parquet.`$dir/part.parquet` where 1=0")),

    // ── A1+O1+P11+F8: grouped sum + mixed-direction sort (`2_Silver:63`)
    "q_a1_grouped_sum_sort" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(col("o_totalprice")), 2).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_year").asc, col("total_price").desc)),

    // ── A2: ungrouped scalar max (`3(1):123`) ──────────────────────────
    "q_a2_scalar_max" -> ((s, dir) =>
      t(s, dir, "orders").agg(max(col("o_orderkey")).as("max_key"))),

    // ── A3: multi-column DISTINCT (`3(1):44-46`) ───────────────────────
    "q_a3_distinct" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_brand"), col("p_type")).distinct()),

    // ── J1: left-outer equi join, dim broadcast (`3(1):79`) ────────────
    "q_j1_left_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_name"))
    }),

    // ── J2: 4-way chained left join, star shape (`4_Fact:46-51`) ───────
    "q_j2_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "left")
        .join(o, li("l_orderkey") === o("o_orderkey"), "left")
        .select(li("l_orderkey"), li("l_linenumber"), li("l_quantity"),
          li("l_extendedprice"), p("p_name"), sup("s_name"),
          o("o_orderpriority"))
    }),

    // ── U1: positional UNION ALL (`3(1):146`) ──────────────────────────
    "q_u1_union_positional" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      n.filter(col("n_nationkey") < 12).select(col("n_nationkey"), col("n_name"))
        .union(n.filter(col("n_nationkey") >= 12)
          .select(col("n_nationkey"), col("n_name")))
    }),

    // ── U2/U3: INTERSECT / EXCEPT (distinct set semantics) ─────────────
    "q_u2_intersect" -> ((s, dir) => {
      val p = t(s, dir, "part")
      p.filter(col("p_size") <= 30).select(col("p_brand"), col("p_type"))
        .intersect(p.filter(col("p_size") >= 20)
          .select(col("p_brand"), col("p_type")))
    }),
    "q_u3_except" -> ((s, dir) => {
      val p = t(s, dir, "part")
      // size in the tuple keeps the difference non-empty at every sf
      // (the distinct triples whose size is <= 10)
      p.select(col("p_brand"), col("p_type"), col("p_size"))
        .except(p.filter(col("p_size") > 10)
          .select(col("p_brand"), col("p_type"), col("p_size")))
    }),

    // ── F10: date/time scalar surface (year/quarter/month/dayofweek,
    //    date arithmetic, truncation) ────────────────────────────────────
    "q_f_dates" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("o_year"),
        quarter(col("o_orderdate")).cast("int").as("o_quarter"),
        month(col("o_orderdate")).cast("int").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("int").as("o_day"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        col("o_orderdate").cast("date").as("o_date"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"))),

    // ── O1: standalone global mixed-direction sort ─────────────────────
    "q_o1_sort" -> ((s, dir) =>
      t(s, dir, "supplier")
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))),

    // ── A1 over the fact grain: filter-pushdown + grouped sums ─────────
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          discRevenue.as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // ── Headline analytics: TPC-H Q3 shape — selective dim filter
    //    broadcast against two large tables, group + top-k ──────────────
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
        .agg(discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // ── Q5 shape: snowflake joins (region→nation→supplier) + co-located
    //    customer/supplier nation constraint ─────────────────────────────
    "q5_region_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ── Q10 shape: returned-item customer ranking, top-k ───────────────
    "q10_returned_customers" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ── J3/J4: parquet-backed MERGE upsert (`3(1):163-169`) — runs the
    //    real Upsert engine against a scratch dir; final state is
    //    deterministic and SQL-expressible, so it DOES get an oracle ───
    "q_j3_upsert" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_upsert_q_${graft.engine.Scratch.runToken}"
      val target = part.filter(col("p_size") <= 25)
      val src = part.filter(col("p_size") > 20)
        .withColumn("p_retailprice", col("p_retailprice") * 2)
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      target.write.mode("overwrite").parquet(scratch)
      Upsert.forPath(s, scratch)
        .merge(src, Seq("p_partkey"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
      s.read.parquet(scratch)
    }),

    // ── J8: MERGE with schema evolution — the source carries a column
    //    the target has never seen; after the merge the target schema
    //    is widened, matched rows take source values, untouched rows
    //    read null in the new column (Delta autoMerge semantics) ───────
    "q_j8_merge_evolve" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val scratch =
        s"${System.getProperty("java.io.tmpdir")}/graft_evolve_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      cust.select(col("c_custkey"), col("c_name"))
        .write.mode("overwrite").parquet(scratch)
      val src = cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit("!")).as("c_name"),
          col("c_mktsegment"))
      Upsert.forPath(s, scratch)
        .merge(src, Seq("c_custkey"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .withUniqueKeyTarget()
        .withSchemaEvolution()
        .execute()
      s.read.parquet(scratch)
    }),

    // ── J10: CDC apply — an I/U/D changefeed applied in one atomic
    //    commit (whenMatchedDelete + UpdateAll + InsertAll, op-driven).
    //    Slices of part by key mod 7: deletes, tripled-price updates,
    //    shifted-key inserts ───────────────────────────────────────────
    "q_cdc_apply" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_cdc_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      part.write.mode("overwrite").parquet(scratch)
      val changes = part.filter(col("p_partkey") % 7 === 0)
        .withColumn("op", lit("D"))
        .unionByName(part.filter(col("p_partkey") % 7 === 1)
          .withColumn("p_retailprice", col("p_retailprice") * 3)
          .withColumn("op", lit("U")))
        .unionByName(part.filter(col("p_partkey") % 7 === 2)
          .withColumn("p_partkey", col("p_partkey") + 1000000L)
          .withColumn("op", lit("I")))
      Upsert.applyChanges(s, scratch, changes, Seq("p_partkey"),
        uniqueKeyTarget = true)
      s.read.parquet(scratch)
    }),

    // ── S3 variant: JSON-lines source round-trip (schema inference) ────
    "q_s3_json_roundtrip" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_json_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      t(s, dir, "region").write.json(scratch)
      graft.engine.Ingest.readJson(s, scratch)
        .select(col("r_regionkey"), col("r_name"))
    }),

    // ── S3 variant: ORC source round-trip (columnar, self-describing;
    //    pushdown survives like parquet) ──────────────────────────────
    "q_s3_orc_roundtrip" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_orc_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      t(s, dir, "supplier").write.orc(scratch)
      graft.engine.Ingest.readOrc(s, scratch)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
    }),

    // ── S4 variant: z-ordered layout write + read-back — the write-side
    //    pruning layout on the driver surface; content equality is the
    //    oracle, file-range narrowness is LayoutExtensionsSpec's job ──
    "q_s4_zorder_roundtrip" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_q_${graft.engine.Scratch.runToken}"
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      graft.engine.Layout.writeZOrdered(li, scratch, numFiles = 8,
        bits = 12, col("l_orderkey"), col("l_partkey"))
      s.read.parquet(scratch)
    }),

    // ── F2: monotonically_increasing_id — nondeterministic values, no
    //    oracle; ScalaTest asserts uniqueness/monotonicity invariants ──
    "q_f2_mid" -> ((s, dir) =>
      t(s, dir, "part")
        .withColumn("surrogate_key", lit(1L) + monotonically_increasing_id())
        .select(col("p_partkey"), col("surrogate_key"))),

    // ── S3: CSV source round-trip (header, inferSchema) ────────────────
    "q_s3_csv_roundtrip" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_csv_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      t(s, dir, "nation").write.option("header", "true").csv(scratch)
      graft.engine.Ingest.readCsv(s, scratch)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    }),

    // ── S23: aggregation pushdown to the manifest — COUNT(*),
    //    SUM/MIN/MAX(col) and non-null COUNT(col) answered from the
    //    per-file stats without opening a single data file (the
    //    catalog-lookup-vs-table-scan difference at 100 TB). Shares
    //    q_s9's staged table; the oracle is the FULL-SCAN aggregate,
    //    so the metadata answer must be exact ──
    "q_s23_meta_agg" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "skip",
        s"$dir/lineitem.parquet", "stats-names-v4") { out =>
        val path = s"$out/li"
        graft.engine.Layout.writeRangeSorted(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          path, numFiles = 16, col("l_orderkey"))
        graft.engine.Layout.writeFileStats(s, path, Seq("l_orderkey"))
      }
      graft.engine.Layout.metadataAgg(s, s"$scratch/li")
        .select(col("n_rows"), col("sum_l_orderkey"),
          col("min_l_orderkey"), col("max_l_orderkey"),
          col("cnt_l_orderkey"))
    }),

    // ── S22: malformed-record quarantine — PERMISSIVE CSV ingest with
    //    a corrupt-record column: bad rows surface as quarantine rows
    //    (never dropped silently, never failing the batch), good rows
    //    parse exactly. The synthetic feed plants one malformed line
    //    per ten (unparseable int + wrong arity); the oracle replays
    //    the plant arithmetic over range(count(orders)) ─────────────
    "q_s22_csv_badrecords" -> ((s, dir) => {
      val n = t(s, dir, "orders").count()
      val scratch = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_badcsv_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      import s.implicits._
      s.range(n).select(
          when(col("id") % 10 === 7, lit("BAD,row"))
            .otherwise(concat_ws(",", col("id"),
              concat(lit("name_"), col("id")), col("id") * 3))
            .as("line"))
        .coalesce(4).write.text(scratch)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_bad",
          org.apache.spark.sql.types.StringType)))
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(scratch)
      // the output must touch EVERY data column: Catalyst prunes the
      // parse to the referenced fields, and a record is only marked
      // corrupt if a REFERENCED field fails to convert — an agg over
      // (v, _bad) alone would read "BAD,row" as (null, null) with no
      // type failure and quarantine nothing (measured: n_bad = 0)
      parsed.agg(
        sum(when(col("_bad").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("_bad").isNull, col("v")).otherwise(0L))
          .as("sum_v_good"),
        sum(when(col("_bad").isNull, col("id")).otherwise(0L))
          .as("sum_id_good"),
        count(col("name")).as("n_named"))
    }),

    // ── The full SCD Type-1 template (distinct → left-join sink →
    //    null-split → key alloc → union → MERGE), run initial +
    //    incremental against a scratch warehouse. Keys are
    //    nondeterministic, so the gate compares the entity content ────
    "q_scd1_dim_build" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_scd1_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val catalog = graft.engine.TableCatalog(s, scratch)
      val scd = new graft.engine.ScdType1(s, catalog)
      val spec = graft.engine.DimSpec("gold.dim_part", Seq("p_partkey"),
        Seq("p_name"), "dim_part_key")
      val part = t(s, dir, "part")
      scd.build(spec, part.filter(col("p_size") <= 30), incremental = false)
      scd.build(spec, part, incremental = true)
      catalog.read(spec.table).select(col("p_partkey"), col("p_name"))
    }),

    // ── The ANALYZE → catalog stats → CBO loop, end-to-end: register,
    //    analyze (row count + column min/max/NDV), then plan a
    //    selective-filter join under cbo.enabled. CboSpec pins that
    //    these stats flip this join shape from shuffle to broadcast;
    //    here the whole path runs against a scratch warehouse and the
    //    ANSWER is checked (stats change plans, never results) ────────
    "q_cbo_join" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_cbo_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val catalog = graft.engine.TableCatalog(s, scratch)
      catalog.overwrite("silver.orders_cbo_q", t(s, dir, "orders"))
      catalog.overwrite("silver.customer_cbo_q", t(s, dir, "customer"))
      catalog.analyze("silver.orders_cbo_q", Seq("o_orderkey", "o_custkey"))
      catalog.analyze("silver.customer_cbo_q", Seq("c_custkey"))
      val saved = s.conf.getOption("spark.sql.cbo.enabled")
      s.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val df = s.table(catalog.metastoreName("silver.orders_cbo_q"))
          .filter(col("o_orderkey") < 50)
          .join(s.table(catalog.metastoreName("silver.customer_cbo_q")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
        df.queryExecution.executedPlan // plan NOW, while CBO is on
        df
      } finally saved match {
        case Some(v) => s.conf.set("spark.sql.cbo.enabled", v)
        case None    => s.conf.unset("spark.sql.cbo.enabled")
      }
    }),

    // ── Streaming CDC end-to-end: a changefeed parquet dir driven
    //    through TWO real streaming runs (insert load, then
    //    update+delete increment) restarting on one checkpoint —
    //    foreachBatch → StreamingCdc.applyCdcBatch → the claim-file
    //    ledger. Exactly-once + crash semantics pinned in CdcStreamSpec;
    //    here the FINAL SNAPSHOT is oracle-checked ────────────────────
    "q_cdc_stream" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_cdc_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val feedDir = s"$scratch/feed"
      val tablePath = s"$scratch/table"
      val ckpt = s"$scratch/ckpt"
      val part = t(s, dir, "part").select(col("p_partkey"), col("p_name"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
      val b0 = part.withColumn("op", lit("I"))
      // U and D key sets are disjoint, so the increment is one batch
      val b1 = part
        .filter(col("p_partkey") % 3 === 1 && col("p_partkey") % 10 =!= 0)
        .withColumn("price_cents", col("price_cents") + 100)
        .withColumn("op", lit("U"))
        .unionByName(part.filter(col("p_partkey") % 10 === 0)
          .withColumn("op", lit("D")))
      b0.coalesce(1).write.mode("append").parquet(feedDir)
      graft.streaming.StreamingCdc.applyChangesStream(
        s, feedDir, tablePath, ckpt, Seq("p_partkey"))
      b1.coalesce(1).write.mode("append").parquet(feedDir)
      graft.streaming.StreamingCdc.applyChangesStream(
        s, feedDir, tablePath, ckpt, Seq("p_partkey"))
      new graft.engine.VersionedTable(s, tablePath).read()
        .select(col("p_partkey"), col("p_name"), col("price_cents"))
    }),

    // ── S13: schema-merging read — two parquet batches with different
    //    (compatible) schemas in one directory union at read time with
    //    mergeSchema; the pre-evolution files' missing column reads as
    //    null. The schema-drift-over-time reality of any long-lived
    //    landing zone ───────────────────────────────────────────────
    "q_s13_merge_schema" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_msch_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val base = t(s, dir, "part")
      base.filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey"), col("p_name"))
        .write.mode("append").parquet(scratch)
      base.filter(col("p_partkey") % 2 === 1)
        .select(col("p_partkey"), col("p_name"),
          round(col("p_retailprice") * 100).cast("long").as("price_cents"))
        .write.mode("append").parquet(scratch)
      s.read.option("mergeSchema", "true").parquet(scratch)
        .select(col("p_partkey"), col("p_name"), col("price_cents"))
    }),

    // ── F12: JSON scalars — build a CANONICAL json string from columns
    //    (format_string on both sides, so no engine serializer's key
    //    order or spacing is in play) and extract fields back. The
    //    semi-structured-ingest surface: get_json_object is the
    //    scan-side projection a raw-JSON lake lives on ────────────────
    "q_f_json" -> ((s, dir) =>
      t(s, dir, "supplier")
        .select(col("s_suppkey"),
          format_string("""{"k":%d,"n":"%s","b":%d}""",
            col("s_suppkey"), col("s_name"),
            round(col("s_acctbal") * 100).cast("long")).as("__j"))
        .select(col("s_suppkey"),
          get_json_object(col("__j"), "$.n").as("name_j"),
          get_json_object(col("__j"), "$.b").cast("long").as("bal_cents"))),

    // ── F10: higher-order array functions — sequence/transform/filter/
    //    aggregate as one codegen'd projection (no explode, no shuffle,
    //    no UDF). NOTES lesson #1 applies at scale: the SOURCE array is
    //    built once per row here; non-trivial subtrees must be staged
    //    before entering a lambda ─────────────────────────────────────
    "q_f_hof" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          sequence(lit(1L), (col("p_size") % 5 + 1).cast("long")).as("__a"))
        .select(col("p_partkey"),
          filter(transform(col("__a"), x => x * col("p_partkey")),
            x => x % 2 === 0).as("__evens"))
        .select(col("p_partkey"),
          array_join(col("__evens").cast("array<string>"), ",").as("evens_csv"),
          aggregate(col("__evens"), lit(0L), (acc, x) => acc + x).as("evens_sum"))),

    // ── S14: date-partitioned layout + partition-pruned read — the
    //    canonical 100 TB fact layout (partition by day, query a date
    //    range, scan 3 of 3,000 directories). Built once per source
    //    via Scratch; PlanQualitySpec pins the PartitionFilters ──────
    "q_s14_date_partition" -> ((s, dir) => {
      val staged = graft.engine.Scratch.ensure(s, "datepart",
        s"$dir/events.parquet") { out =>
        graft.streaming.EventStream.loadEvents(s, s"$dir/events.parquet")
          .withColumn("event_date", to_date(col("ts")))
          .write.partitionBy("event_date").parquet(out)
      }
      s.read.parquet(staged)
        .filter(col("event_date").between(lit("2024-01-03"), lit("2024-01-05")))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("event_date").cast("string").as("event_date"))
    }),

    // ── Change data feed: diff two snapshots into the I/U/D feed that
    //    replays one into the other (inverse of applyChanges; the
    //    round-trip identity is pinned in PropertySpec). D rows carry
    //    the BEFORE values, unchanged keys produce no traffic ─────────
    "q_cdc_diff" -> ((s, dir) => {
      val base = t(s, dir, "part").select(col("p_partkey"), col("p_name"),
        col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
      val before = base.filter(col("p_partkey") % 7 =!= 0).drop("p_size")
      val after = base.filter(col("p_size") <= 48)
        .withColumn("price_cents", col("price_cents") +
          when(col("p_partkey") % 5 === 0, 100L).otherwise(0L))
        .drop("p_size")
      graft.engine.Upsert.changeFeed(before, after, Seq("p_partkey"))
    }),

    // ── W1: running total per key — the window shape a bounded top-k
    //    aggregator CANNOT express (every prefix is an output row).
    //    Scale: one shuffle on the partition key, in-partition sort,
    //    no global ordering; frame pinned to ROWS so both engines'
    //    peer handling is moot (the order key is unique per row) ──────
    "q_w_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("__cents"))
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("int").as("order_seq"),
          sum(col("__cents")).over(w).as("running_cents"))
    }),

    // ── W2: lag over a bounded aggregate — month-over-month revenue
    //    delta. The unpartitioned window is DELIBERATE and safe: it
    //    orders the per-month rollup (cardinality = months in the
    //    dataset, bounded), never raw facts ───────────────────────────
    "q_w_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
      val w = Window.orderBy(col("month"))
      m.select(col("month"), col("n_orders"), col("rev_cents"),
        (col("rev_cents") - lag(col("rev_cents"), 1).over(w))
          .as("delta_cents"))
    }),

    // ── W3: dense_rank with tie semantics — top spenders per nation.
    //    dense_rank's equal-rank-for-equal-value contract is what the
    //    bounded TopK aggregator (exactly k rows) can't express; spend
    //    is exact cents so ranks are engine-deterministic ─────────────
    // ── W4: QUALIFY-style latest-row-per-key dedup — row_number()=1
    //    over (key, recency order). THE SCD/log-compaction idiom; the
    //    order key is made total (date, then orderkey) so both engines
    //    pick the same survivor deterministically ─────────────────────
    "q_w_latest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(w).as("__rn"))
        .filter(col("__rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    }),

    // ── S12: dynamic partition overwrite — rewrite ONLY the partitions
    //    present in the incremental batch (partitionOverwriteMode=
    //    dynamic), the daily-reload idiom: at 100 TB the update touches
    //    3 of 3,000 date partitions and the other 2,997 stay as-is ────
    "q_s12_dyn_overwrite" -> ((s, dir) => {
      val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_dynow_q_${graft.engine.Scratch.runToken}"
      val fs = new org.apache.hadoop.fs.Path(scratch)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      orders.write.partitionBy("o_orderpriority").parquet(scratch)
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        // the increment: every 1-URGENT order re-lands with doubled
        // cents; ONLY that partition directory is rewritten
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .withColumn("price_cents", col("price_cents") * 2)
          .write.mode("overwrite").partitionBy("o_orderpriority")
          .parquet(scratch)
      finally saved match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(scratch)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").cast("string").as("o_orderpriority"),
          col("price_cents"))
    }),

    "q_w_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spend = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("spend_cents"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("spend_cents").desc)
      spend.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"), col("spend_cents"))
        .withColumn("rnk", dense_rank().over(w).cast("int"))
        .filter(col("rnk") <= 3)
    }),

    // ── A5: ordered list aggregation — collect_list is unordered by
    //    contract, so sort_array before joining makes the result
    //    deterministic (same reason the oracle ORDER BYs inside
    //    string_agg) ──────────────────────────────────────────────────
    "q_a5_stringagg" -> ((s, dir) =>
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"),
          count(lit(1)).as("n_nations"))),

    // ── A6: exact percentiles per group. Exact `percentile` holds a
    //    per-group value-count map — right for bounded-domain columns
    //    like quantity (50 distinct values); for unbounded domains at
    //    100 TB the scale path is approx_percentile (t-digest), which
    //    is engine-specific and therefore spec-gated, not oracle-gated.
    //    Quantity values and quarter-fractions are small-integer
    //    doubles, so interpolation is EXACT in both engines ───────────
    "q_a6_quantiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          expr("percentile(l_quantity, 0.9)").as("q90"))),

    // ── J5: skew-salted equi-join — row-identical to the plain join
    //    (that identity IS the gate), with the hot-key fan-out shape a
    //    1000-executor cluster needs when AQE's skew split can't see
    //    the skew. Aggregated output keeps the gate small ─────────────
    "q_j4_salted" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.engine.SkewJoin.saltedJoin(li, o, Seq("l_orderkey"),
        saltBuckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // ── J10: differential (adaptive) salting — detect hot keys from
    //    one count pass, salt ONLY them, cold keys take the plain hash
    //    join. The synth puts 30% of lineitem on key 0; threshold 5000
    //    isolates it at sf0.01/sf0.1 (at sf0.001 nothing is hot and
    //    the operator must degrade to the plain join — same answer) ──
    "q_j10_adaptive_salt" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 < 3, 0L)
          .otherwise(col("l_orderkey") % 1000).as("k"),
        col("l_quantity"))
      val dim = li.select(col("k")).distinct()
        .withColumn("label", col("k") % 7)
      graft.engine.SkewJoin.adaptiveSaltedJoin(li, dim, "k",
          hotThreshold = 5000, saltBuckets = 8)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // ── A7: CUBE — all four grouping sets from one aggregation pass
    //    (the sibling of q_t_stats' ROLLUP; exact cents arithmetic) ───
    "q_a7_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          round(col("o_totalprice") * 100).cast("long").as("__cents"))
        .cube(col("o_orderpriority"), col("o_year"))
        .agg(count(lit(1)).as("n_orders"), sum(col("__cents")).as("rev_cents"))),

    // ── F11: string scalar surface (case, substring, pad, regex,
    //    search) — all codegen'd builtins, no UDFs ────────────────────
    "q_f_strings" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        length(col("c_name")).cast("int").as("name_len"),
        substring(col("c_name"), 1, 10).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded_key"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"))),

    // ── J5: FULL OUTER equi join — both unmatched sides survive; the
    //    deterministic key-slicing (mod filters) manufactures rows that
    //    exist on exactly one side so the gate exercises all three
    //    match classes ─────────────────────────────────────────────────
    "q_j5_full_outer" -> ((s, dir) => {
      val left = t(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val right = t(s, dir, "orders").filter(col("o_custkey") % 3 === 0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      left.join(right, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
    }),

    // ── J6: LEFT SEMI + LEFT ANTI — the existence-join pair the engine
    //    uses internally everywhere (decontamination, candidate
    //    verification, MERGE not-matched); gated directly here. Semi
    //    and anti partition the customer table, so the union is a
    //    conservation check too ────────────────────────────────────────
    "q_j6_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ord = t(s, dir, "orders").select(col("o_custkey"))
      val semi = cust.join(ord, col("c_custkey") === col("o_custkey"),
        "left_semi").withColumn("tag", lit("has_orders"))
      val anti = cust.join(ord, col("c_custkey") === col("o_custkey"),
        "left_anti").withColumn("tag", lit("no_orders"))
      semi.unionByName(anti)
    }),

    // ── SQ1: subquery surface — scalar subqueries, IN-subquery, and a
    //    correlated EXISTS in one predicate. The above-average-price
    //    test is exact integer arithmetic (cents·count > Σcents), never
    //    a double `> avg(...)` whose last-ulp could differ between
    //    engines and flip a row ────────────────────────────────────────
    "q_sq_subquery" -> ((s, dir) => {
      val o = s"parquet.`$dir/orders.parquet`"
      val c = s"parquet.`$dir/customer.parquet`"
      val l = s"parquet.`$dir/lineitem.parquet`"
      s.sql(
        s"""SELECT o_orderkey, o_totalprice FROM $o
           |WHERE CAST(round(o_totalprice*100) AS BIGINT)
           |        * (SELECT count(*) FROM $o)
           |      > (SELECT sum(CAST(round(o_totalprice*100) AS BIGINT)) FROM $o)
           |  AND o_custkey IN
           |      (SELECT c_custkey FROM $c WHERE c_mktsegment = 'BUILDING')
           |  AND EXISTS (SELECT 1 FROM $l
           |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
           |""".stripMargin)
    }),

    // ── A8: explicit GROUPING SETS + grouping() flags — the general
    //    form behind rollup (q_t_stats) and cube (q_a7_cube); the
    //    (priority), ((priority, year)), () sets are NOT a rollup
    //    prefix chain, so this exercises the arbitrary-sets path ───────
    "q_a8_gsets" -> ((s, dir) => {
      val o = s"parquet.`$dir/orders.parquet`"
      s.sql(
        s"""WITH o AS (SELECT o_orderpriority,
           |  CAST(year(o_orderdate) AS INT) AS o_year,
           |  CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM $o)
           |SELECT o_orderpriority, o_year,
           |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
           |  CAST(grouping(o_year) AS INT) AS g_year,
           |  count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS rev_cents
           |FROM o
           |GROUP BY GROUPING SETS ((o_orderpriority, o_year),
           |  (o_orderpriority), ())
           |""".stripMargin)
    }),

    // ── F12: null/conditional scalar surface — nullif, coalesce,
    //    least/greatest, searched CASE ─────────────────────────────────
    "q_f_nullcond" -> ((s, dir) =>
      t(s, dir, "part").selectExpr("p_partkey",
        "nullif(p_size % 5, 0) AS nz",
        "coalesce(nullif(p_size % 5, 0), -1) AS nz_filled",
        "least(p_size, 25) AS lo",
        "greatest(p_size, 25) AS hi",
        "CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' " +
          "ELSE 'L' END AS size_class")),

    // ── W4: window frame surface — first/last/nth_value over explicit
    //    ROWS frames, lead, ntile. (o_orderdate, o_orderkey) is a total
    //    order within each partition, so every function is
    //    deterministic ──────────────────────────────────────────────────
    "q_w_frames" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val grow = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(grow).as("first_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        ntile(4).over(w).cast("int").as("quartile"))
    }),

    // ── W: distribution window functions (percent_rank / cume_dist) —
    //    per-priority order-value percentiles. The order key
    //    (cents, o_orderkey) is a total order, so rank is unique; both
    //    engines evaluate the SAME double ((r-1)/(n-1), r/n), so the
    //    micros rounding is bit-identical — no cross-engine drift. One
    //    shuffle (hash by priority), sort inside partitions ────────────
    "q_w_dist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("cents"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
          round(percent_rank().over(w) * 1000000).cast("long")
            .as("pr_micros"),
          round(cume_dist().over(w) * 1000000).cast("long")
            .as("cd_micros"))
    }),

    // ── J7: bucketed co-located join — the zero-shuffle join path a
    //    1000-executor cluster lives on: both sides written bucketed on
    //    the join key (same bucket count), so the join consumes the
    //    on-disk hash-partitioning and neither side shuffles
    //    (PlanQualitySpec pins zero ShuffleExchange on the join).
    //    The oracle is the plain join — bucketing must be invisible ────
    "q_j7_bucketed" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val catalog = graft.engine.TableCatalog(s, s"$root/graft-bucketed-wh")
      // content-keyed names: build once per input per session — the
      // operator under measurement is the zero-shuffle JOIN; bench
      // reps must not re-pay the one-time layout write. The key embeds
      // the full path + size/mtime (Scratch.tableKey — the CASE-STABLE
      // length-bounded variant: the metastore lowercases identifiers,
      // so contentKey's passthrough of uppercase letters would let two
      // paths differing only in case collide), so distinct dirs can
      // never collide and a regenerated source gets a fresh table
      // instead of a stale layout
      val key = graft.engine.Scratch.tableKey(s, dir)
      val (oName, liName) = (s"silver.o_b8_$key", s"silver.li_b8_$key")
      if (!s.catalog.tableExists(catalog.metastoreName(oName)))
        catalog.overwriteBucketed(oName,
          t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          Seq("o_orderkey"), 8)
      if (!s.catalog.tableExists(catalog.metastoreName(liName)))
        catalog.overwriteBucketed(liName,
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice")),
          Seq("l_orderkey"), 8)
      catalog.readBucketed(liName)
        .join(catalog.readBucketed(oName),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("price_cents"))
    }),

    // ── J9: explicit CROSS JOIN (small × small — plans as a broadcast
    //    nested loop, never a shuffled CartesianProduct; the only
    //    sanctioned all-pairs surface besides the labeled oracles) ────
    "q_j9_cross" -> ((s, dir) =>
      t(s, dir, "region").select(col("r_name"))
        .crossJoin(t(s, dir, "nation").select(col("n_name")))),

    // ── S13: file-level data skipping — range-sorted layout + per-file
    //    min/max manifest; the interval read opens only intersecting
    //    files and must equal the full-scan filter (the oracle). The
    //    layout+manifest build once per input dir (like the bucketed
    //    tables); the gate times the SKIPPING READ ─────────────────────
    "q_s9_skipping" -> ((s, dir) => {
      // Scratch.ensure handles both prior hazards here: a crash
      // between the two writes rebuilds (marker lands only after
      // both), and a REGENERATED source at the same path rebuilds too
      // (marker mtime vs newest source file)
      // fingerprint "stats-names-v4": the manifest format changed from
      // absolute input_file_name() URIs to table-relative names — a
      // cached artifact with the old manifest must rebuild
      val scratch = graft.engine.Scratch.ensure(s, "skip",
        s"$dir/lineitem.parquet", "stats-names-v4") { out =>
        val path = s"$out/li"
        graft.engine.Layout.writeRangeSorted(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          path, numFiles = 16, col("l_orderkey"))
        graft.engine.Layout.writeFileStats(s, path, Seq("l_orderkey"))
      }
      graft.engine.Layout.prunedRead(s, s"$scratch/li", "l_orderkey",
        1000L, 3000L)
    }),

    // ── S16: targeted DELETE through the skipping manifest — only the
    //    files whose range intersects the doomed interval rewrite;
    //    the rest stay untouched bytes (LayoutExtensionsSpec pins
    //    that). Own scratch tag: the delete MUTATES the artifact,
    //    so sharing q_s9's table would corrupt its oracle ─────────────
    "q_s16_delete" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "delskip",
        s"$dir/lineitem.parquet", "stats-names-v4") { out =>
        val path = s"$out/li"
        graft.engine.Layout.writeRangeSorted(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          path, numFiles = 16, col("l_orderkey"))
        graft.engine.Layout.writeFileStats(s, path, Seq("l_orderkey"))
      }
      graft.engine.Layout.deleteMatching(s, s"$scratch/li",
        "l_orderkey", 1000L, 3000L)
      graft.engine.Layout.manifestRead(s, s"$scratch/li")
    }),

    // ── S17: copy-on-write UPDATE through the same manifest protocol:
    //    bump quantities in a key range; only intersecting files
    //    rewrite ─────────────────────────────────────────────────────
    "q_s17_update" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "updskip",
        s"$dir/lineitem.parquet", "stats-names-v4") { out =>
        val path = s"$out/li"
        graft.engine.Layout.writeRangeSorted(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"), col("l_extendedprice")),
          path, numFiles = 16, col("l_orderkey"))
        graft.engine.Layout.writeFileStats(s, path, Seq("l_orderkey"))
      }
      // idempotent across reps: the update SETS (not increments) the
      // quantity, so a cached scratch re-running the rewrite lands on
      // the same state
      graft.engine.Layout.updateMatching(s, s"$scratch/li",
        "l_orderkey", 1000L, 3000L)(df => df.withColumn("l_quantity",
        when(col("l_orderkey").between(1000L, 3000L), lit(99.0))
          .otherwise(col("l_quantity"))))
      graft.engine.Layout.manifestRead(s, s"$scratch/li")
    }),

    // ── S11: versioned table — atomic generational commits with
    //    snapshot isolation and time travel (VersionedTable; the
    //    Delta-commit behavior the reference leans on, rebuilt over
    //    plain parquet + atomic claim files). The gate overwrites the
    //    table TWICE and reads BOTH versions back: v0 must still be
    //    the filtered snapshot after the v1 overwrite ─────────────────
    "q_s7_timetravel" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val tbl = new graft.engine.VersionedTable(s, s"$root/graft-vt/part_tt")
      tbl.destroy() // deterministic version ordinals on every rep
      val part = t(s, dir, "part")
      val v0 = tbl.overwrite(part.filter(col("p_size") > 25))
      val v1 = tbl.overwrite(part)
      def snap(v: Long, label: String) =
        tbl.readVersion(v)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("p_partkey")).cast("long").as("sum_key"))
          .withColumn("snap", lit(label))
      snap(v0, "v0").unionByName(snap(v1, "v1"))
        .select(col("snap"), col("n_rows"), col("sum_key"))
    }),

    // ── S19: RESTORE TO VERSION — a bad overwrite undone as a NEW
    //    metadata-only commit (a redirect file, zero data copied: the
    //    Delta RESTORE cost model at 100 TB). read() after the restore
    //    must equal the restored snapshot, the bad version must stay
    //    readable for forensics, and latest must have advanced —
    //    VersionedTableSpec pins the redirect mechanics and vacuum
    //    target-protection ─────────────────────────────────────────────
    "q_s19_restore" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val tbl = new graft.engine.VersionedTable(s, s"$root/graft-vt/part_rs")
      tbl.destroy()
      val part = t(s, dir, "part")
      val v0 = tbl.overwrite(part.filter(col("p_size") > 25))
      val v1 = tbl.overwrite(part.limit(1)) // the "bad deploy"
      val v2 = tbl.restore(v0)
      def agg(df: org.apache.spark.sql.DataFrame, label: String) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(col("p_partkey")).cast("long").as("sum_key"))
          .withColumn("snap", lit(label))
      // `restored` reads through the redirect; `bad` proves history
      // survived; emitting latestVersion pins that restore COMMITS
      agg(tbl.read(), "restored")
        .unionByName(agg(tbl.readVersion(v0), "v0"))
        .withColumn("latest_delta", lit(v2 - v0)) // 2 by construction
        .select(col("snap"), col("n_rows"), col("sum_key"),
          col("latest_delta"))
    }),

    // ── S20: DESCRIBE HISTORY — the audit surface of the versioned
    //    table: every live version with its kind and the data
    //    generation that backs it (a restore reports its target).
    //    Deterministic columns only; file counts/bytes are
    //    layout-dependent and spec-covered instead ───────────────────
    "q_s20_history" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val tbl = new graft.engine.VersionedTable(s, s"$root/graft-vt/part_hs")
      tbl.destroy()
      val part = t(s, dir, "part")
      tbl.overwrite(part.filter(col("p_size") > 25))
      tbl.overwrite(part)
      tbl.restore(0L)
      tbl.history().select(col("version"), col("kind"), col("target"))
    }),

    // ── S21: Bloom-index point lookup — equality skipping on a
    //    HASH-distributed key, where every file's [min,max] spans the
    //    whole range and the interval manifest prunes nothing. The
    //    per-file Bloom (Catalyst's own BloomFilterAggregate, one
    //    pass, grouped by input_file_name) opens ~1 of 16 files per
    //    key; a false positive costs a wasted open, never a wrong row
    //    (the exact filter still runs). LayoutExtensionsSpec pins the
    //    pruning ratio and absent-key behavior ──────────────────────
    "q_s21_bloom_point" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "bloomidx",
        s"$dir/orders.parquet", "bloom-v2") { out =>
        val path = s"$out/ord"
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .repartition(16, col("o_orderkey"))
          .write.parquet(path)
        graft.engine.Layout.writeFileStats(s, path, Seq("o_orderkey"),
          bloomCols = Seq("o_orderkey"))
      }
      // three smallest keys — present at every sf, driver metadata
      val keys = t(s, dir, "orders").select(col("o_orderkey"))
        .orderBy(col("o_orderkey")).limit(3).collect().map(_.getLong(0))
      keys.map(k => graft.engine.Layout.pointRead(
          s, s"$scratch/ord", "o_orderkey", k))
        .reduce(_ unionByName _)
    }),

    // ── S24: the ONE read front door (round-10 VERDICT #7) — the same
    //    bloom-indexed table answered through Layout.read, which
    //    routes PointEq → bloom skipping, Interval → min/max pruning,
    //    and an untracked column → manifest + exact filter. Every
    //    route must be value-identical to the plain filter (the
    //    oracle); LayoutExtensionsSpec pins that the routing actually
    //    prunes ─────────────────────────────────────────────────────
    "q_s24_front_read" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "bloomidx",
        s"$dir/orders.parquet", "bloom-v2") { out =>
        val path = s"$out/ord"
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .repartition(16, col("o_orderkey"))
          .write.parquet(path)
        graft.engine.Layout.writeFileStats(s, path, Seq("o_orderkey"),
          bloomCols = Seq("o_orderkey"))
      }
      val ks = t(s, dir, "orders").select(col("o_orderkey"))
        .orderBy(col("o_orderkey")).limit(1).collect().map(_.getLong(0))
      val tbl = s"$scratch/ord"
      import graft.engine.Layout
      Layout.read(s, tbl, Some(Layout.PointEq("o_orderkey", ks(0))))
        .unionByName(Layout.read(s, tbl,
          Some(Layout.Interval("o_orderkey", ks(0) + 1, ks(0) + 64))))
        .unionByName(Layout.read(s, tbl,
          Some(Layout.PointEq("o_orderpriority", "1-URGENT")))
          .filter(col("o_orderkey") <= ks(0) + 2048))
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price2"),
          col("o_orderpriority"))
    }),

    // ── S25: aggregate front door — Layout.readAgg serves the
    //    no-predicate aggregate from the MANIFEST (zero data files
    //    opened; the spec proves it by corrupting a file) and the
    //    predicate aggregate over the pruned read; both rows must
    //    equal plain SQL over the raw table ─────────────────────────
    "q_s25_front_agg" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "bloomidx",
        s"$dir/orders.parquet", "bloom-v2") { out =>
        val path = s"$out/ord"
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .repartition(16, col("o_orderkey"))
          .write.parquet(path)
        graft.engine.Layout.writeFileStats(s, path, Seq("o_orderkey"),
          bloomCols = Seq("o_orderkey"))
      }
      val tbl = s"$scratch/ord"
      val lo = t(s, dir, "orders").agg(min(col("o_orderkey")))
        .head.getLong(0)
      import graft.engine.Layout
      Layout.readAgg(s, tbl, Seq(("count", "*"), ("sum", "o_orderkey"),
          ("min", "o_orderkey"), ("max", "o_orderkey")))
        .select(lit("all").as("scope"), col("n_rows"),
          col("sum_o_orderkey"), col("min_o_orderkey"),
          col("max_o_orderkey"))
        .unionByName(Layout.readAgg(s, tbl,
            Seq(("count", "*"), ("sum", "o_orderkey"),
              ("min", "o_orderkey"), ("max", "o_orderkey")),
            Some(Layout.Interval("o_orderkey", lo, lo + 4096)))
          .select(lit("interval").as("scope"), col("n_rows"),
            col("sum_o_orderkey"), col("min_o_orderkey"),
            col("max_o_orderkey")))
    }),

    // ── S26: PLANNER-gated skipping (round-10 VERDICT #1) — the same
    //    bloom-indexed table queried through PLAIN SQL with zero
    //    Layout calls: the injected ManifestSkip rule routes the
    //    equality to bloom skipping and the BETWEEN to min/max
    //    pruning at optimization time. Value-identical to the raw
    //    filter (the oracle); PlanQualitySpec pins that the rewritten
    //    scan's file set actually shrinks ───────────────────────────
    "q_s26_planner_skip" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "bloomidx",
        s"$dir/orders.parquet", "bloom-v2") { out =>
        val path = s"$out/ord"
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .repartition(16, col("o_orderkey"))
          .write.parquet(path)
        graft.engine.Layout.writeFileStats(s, path, Seq("o_orderkey"),
          bloomCols = Seq("o_orderkey"))
      }
      val tbl = s"$scratch/ord"
      val k = t(s, dir, "orders").select(col("o_orderkey"))
        .orderBy(col("o_orderkey")).limit(1).collect()(0).getLong(0)
      val sel = "SELECT o_orderkey, round(o_totalprice, 2) AS price2, " +
        s"o_orderpriority FROM parquet.`$tbl`"
      s.sql(s"$sel WHERE o_orderkey = $k UNION ALL " +
        s"$sel WHERE o_orderkey BETWEEN ${k + 1} AND ${k + 64}")
    }),

    // ── S27: PLANNER-gated metadata aggregate — plain SQL
    //    count(*)/sum/min/max/count(col) over the manifest-backed
    //    table, folded to a LocalRelation by the injected ManifestAgg
    //    rule (zero data files opened; PlanQualitySpec proves it by
    //    corrupting one). Values ≡ plain aggregates over the raw
    //    table (the oracle) ─────────────────────────────────────────
    "q_s27_planner_agg" -> ((s, dir) => {
      val scratch = graft.engine.Scratch.ensure(s, "bloomidx",
        s"$dir/orders.parquet", "bloom-v2") { out =>
        val path = s"$out/ord"
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .repartition(16, col("o_orderkey"))
          .write.parquet(path)
        graft.engine.Layout.writeFileStats(s, path, Seq("o_orderkey"),
          bloomCols = Seq("o_orderkey"))
      }
      // avg folds too (round-11 VERDICT #7): exactly-served sum /
      // exactly-served count, guarded by the cnt·max|v| < 2⁵³ bound
      // that makes Spark's double-accumulated Average equal the
      // manifest's exact integer sum in any order
      s.sql("SELECT count(*) AS n_rows, sum(o_orderkey) AS sum_k, " +
        "min(o_orderkey) AS min_k, max(o_orderkey) AS max_k, " +
        "count(o_orderkey) AS cnt_k, avg(o_orderkey) AS avg_k " +
        s"FROM parquet.`$scratch/ord`")
    }),

    // ── S12: small-file compaction — 16 writer files rewritten into a
    //    target-sized generation; content must be IDENTICAL (the
    //    oracle is the raw table) and the pre-compaction version stays
    //    readable (VersionedTableSpec pins file counts + time travel) ─
    "q_s8_compact" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val tbl = new graft.engine.VersionedTable(s, s"$root/graft-vt/part_cp")
      tbl.destroy()
      tbl.overwrite(t(s, dir, "part").repartition(16))
      tbl.compact()
      tbl.read()
    }),

    // ── S15: OPTIMIZE ZORDER BY — the clustering maintenance pass as a
    //    versioned-table generation: content-invisible (that identity
    //    IS the oracle), layout narrowness pinned in VersionedTableSpec ─
    "q_s15_optimize_z" -> ((s, dir) => {
      val root = s.conf.get("graft.scratch.dir",
        System.getProperty("java.io.tmpdir"))
      val tbl = new graft.engine.VersionedTable(s, s"$root/graft-vt/li_oz")
      tbl.destroy()
      tbl.overwrite(t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .repartition(16))
      tbl.compactZOrdered(Seq(col("l_orderkey"), col("l_partkey")),
        targetFileBytes = 512L * 1024, bits = 12)
      tbl.read()
    })
  )

  /** The SQL twin of [[discRevenue]] — factored for the same reason
    * (four oracles share it; an edit must reach all of them at once).
    */
  private val discRevenueSql: String =
    "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0"

  /** DuckDB-equivalent SQL per query (driver runs these on the same
    * parquet registered under bare table names). Omitted: q_f2_mid
    * (nondeterministic ids → rows-only check).
    */
  def oracleSql: Map[String, String] = Map(
    "q_s1_scan_project" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",
    "q_s2_sql_path" ->
      "SELECT DISTINCT p_brand FROM part",
    "q_p2_split" ->
      "SELECT p_partkey, split_part(p_type, ' ', 1) AS type_head FROM part",
    "q_p4_div" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice / l_quantity AS price_per_unit FROM lineitem",
    "q_p3_cast" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS VARCHAR) AS ln_str FROM lineitem",
    "q_p7_scd_old" ->
      ("SELECT p.p_partkey, p.p_name FROM part p " +
        "LEFT JOIN (SELECT p_partkey FROM part WHERE p_size > 25) s " +
        "ON p.p_partkey = s.p_partkey WHERE s.p_partkey IS NOT NULL"),
    "q_p8_scd_new" ->
      ("SELECT p.p_partkey, p.p_name FROM part p " +
        "LEFT JOIN (SELECT p_partkey FROM part WHERE p_size > 25) s " +
        "ON p.p_partkey = s.p_partkey WHERE s.p_partkey IS NULL"),
    "q_p9_schema_only" ->
      "SELECT 1 AS dim_key, p_partkey, p_name FROM part WHERE 1=0",
    "q_a1_grouped_sum_sort" ->
      ("SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year, " +
        "round(sum(o_totalprice), 2) AS total_price, count(*) AS n_orders " +
        "FROM orders GROUP BY 1, 2 ORDER BY o_year ASC, total_price DESC"),
    "q_a2_scalar_max" ->
      "SELECT max(o_orderkey) AS max_key FROM orders",
    "q_a3_distinct" ->
      "SELECT DISTINCT p_brand, p_type FROM part",
    "q_j1_left_join" ->
      ("SELECT c_custkey, c_name, n_name FROM customer " +
        "LEFT JOIN nation ON c_nationkey = n_nationkey"),
    "q_j2_star_join" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, " +
        "p_name, s_name, o_orderpriority FROM lineitem " +
        "LEFT JOIN part ON l_partkey = p_partkey " +
        "LEFT JOIN supplier ON l_suppkey = s_suppkey " +
        "LEFT JOIN orders ON l_orderkey = o_orderkey"),
    "q_u1_union_positional" ->
      ("SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12 " +
        "UNION ALL " +
        "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 12"),
    "q_o1_sort" ->
      ("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier " +
        "ORDER BY s_nationkey ASC, s_acctbal DESC"),
    "q_u2_intersect" ->
      ("SELECT p_brand, p_type FROM part WHERE p_size <= 30 " +
        "INTERSECT SELECT p_brand, p_type FROM part WHERE p_size >= 20"),
    "q_u3_except" ->
      ("SELECT p_brand, p_type, p_size FROM part " +
        "EXCEPT SELECT p_brand, p_type, p_size FROM part WHERE p_size > 10"),
    "q_f_dates" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year, " +
        "CAST(quarter(o_orderdate) AS INT) AS o_quarter, " +
        "CAST(month(o_orderdate) AS INT) AS o_month, " +
        "CAST(day(o_orderdate) AS INT) AS o_day, " +
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "CAST(o_orderdate AS DATE) AS o_date, " +
        "CAST(o_orderdate AS DATE) + 30 AS due_date FROM orders"),
    "q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        s"$discRevenueSql AS sum_disc_price, " +
        "round(avg(l_discount), 6) AS avg_disc, count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q_j3_upsert" ->
      ("SELECT p_partkey, p_name, p_brand, p_type, p_size, " +
        "CASE WHEN p_size > 20 THEN p_retailprice * 2 ELSE p_retailprice END " +
        "AS p_retailprice FROM part"),
    "q3_shipping_priority" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        s"$discRevenueSql AS revenue " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"),
    "q5_region_revenue" ->
      (s"SELECT n_name, $discRevenueSql AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '2000-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q10_returned_customers" ->
      ("SELECT c_custkey, c_name, n_name, " +
        s"$discRevenueSql AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "GROUP BY c_custkey, c_name, n_name " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q_s3_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_s3_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region",
    "q_s3_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    "q_s4_zorder_roundtrip" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem",
    "q_scd1_dim_build" ->
      "SELECT p_partkey, p_name FROM part",
    "q_cbo_join" ->
      ("SELECT o_orderkey, o_custkey, c_name FROM orders " +
        "JOIN customer ON o_custkey = c_custkey WHERE o_orderkey < 50"),
    "q_cdc_stream" ->
      ("SELECT p_partkey, p_name, CAST(round(p_retailprice * 100) AS BIGINT) " +
        "+ CASE WHEN p_partkey % 3 = 1 THEN 100 ELSE 0 END AS price_cents " +
        "FROM part WHERE p_partkey % 10 <> 0"),
    "q_s14_date_partition" ->
      ("SELECT event_id, user_id, event_type, " +
        "CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date FROM events " +
        "WHERE CAST(ts AS DATE) BETWEEN '2024-01-03' AND '2024-01-05'"),
    "q_s13_merge_schema" ->
      ("SELECT p_partkey, p_name, CASE WHEN p_partkey % 2 = 1 THEN " +
        "CAST(round(p_retailprice * 100) AS BIGINT) END AS price_cents " +
        "FROM part"),
    "q_f_json" ->
      ("""SELECT s_suppkey, json_extract_string(printf('{"k":%d,"n":"%s","b":%d}',
         | s_suppkey, s_name, CAST(round(s_acctbal*100) AS BIGINT)), '$.n')
         | AS name_j,
         | CAST(json_extract_string(printf('{"k":%d,"n":"%s","b":%d}',
         | s_suppkey, s_name, CAST(round(s_acctbal*100) AS BIGINT)), '$.b')
         | AS BIGINT) AS bal_cents FROM supplier""".stripMargin)
        .replaceAll(raw"\s+", " "),

    // DuckDB array_to_string(empty list) is NULL where Spark's
    // array_join is '' — coalesce the oracle side
    "q_f_hof" ->
      ("SELECT p_partkey, coalesce(array_to_string(list_filter(" +
        "list_transform(range(1, p_size % 5 + 2), x -> x * p_partkey), " +
        "x -> x % 2 = 0), ','), '') AS evens_csv, " +
        "CAST(coalesce(list_sum(list_filter(" +
        "list_transform(range(1, p_size % 5 + 2), x -> x * p_partkey), " +
        "x -> x % 2 = 0)), 0) AS BIGINT) AS evens_sum FROM part"),
    "q_cdc_diff" ->
      ("SELECT p_partkey, p_name, CAST(round(p_retailprice * 100) AS BIGINT)" +
        " + CASE WHEN p_partkey % 5 = 0 AND op <> 'D' THEN 100 ELSE 0 END " +
        "AS price_cents, op FROM (SELECT p_partkey, p_name, p_retailprice, " +
        "CASE WHEN p_partkey % 7 = 0 AND p_size <= 48 THEN 'I' " +
        "WHEN p_partkey % 7 <> 0 AND p_size > 48 THEN 'D' " +
        "WHEN p_partkey % 7 <> 0 AND p_size <= 48 AND p_partkey % 5 = 0 " +
        "THEN 'U' END AS op FROM part) WHERE op IS NOT NULL"),

    // explicit ROWS frame on both sides: with a unique order key the
    // default RANGE frame is equivalent, but pinning ROWS removes any
    // engine disagreement over peer handling
    "q_w_running" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(row_number() OVER w AS INT) AS order_seq, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) " +
        "AS running_cents FROM orders WINDOW w AS " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"),

    // DuckDB date_trunc('month', ts) yields DATE already; Spark side
    // casts its TIMESTAMP result to date (NOTES.md oracle lesson)
    "q_w_lag" ->
      ("WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) " +
        "AS month, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
        "AS rev_cents FROM orders GROUP BY 1) " +
        "SELECT month, n_orders, rev_cents, " +
        "rev_cents - lag(rev_cents) OVER (ORDER BY month) AS delta_cents " +
        "FROM m"),

    "q_w_latest" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate FROM orders " +
        "QUALIFY row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"),

    "q_s12_dyn_overwrite" ->
      ("SELECT o_orderkey, o_custkey, o_orderpriority, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) * " +
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 2 ELSE 1 END " +
        "AS price_cents FROM orders"),

    "q_w_rank" ->
      ("WITH spend AS (SELECT o_custkey, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
        "AS spend_cents FROM orders GROUP BY 1), " +
        "j AS (SELECT n_name, c_custkey, spend_cents, " +
        "CAST(dense_rank() OVER (PARTITION BY n_name " +
        "ORDER BY spend_cents DESC) AS INT) AS rnk " +
        "FROM spend JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey) " +
        "SELECT n_name, c_custkey, spend_cents, rnk FROM j WHERE rnk <= 3"),

    "q_a5_stringagg" ->
      ("SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
        "count(*) AS n_nations FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"),

    "q_a6_quantiles" ->
      ("SELECT l_returnflag, " +
        "quantile_cont(l_quantity, 0.25) AS q25, " +
        "quantile_cont(l_quantity, 0.5) AS q50, " +
        "quantile_cont(l_quantity, 0.75) AS q75, " +
        "quantile_cont(l_quantity, 0.9) AS q90 " +
        "FROM lineitem GROUP BY l_returnflag"),

    // the oracle is the UNSALTED join: salting must be invisible
    "q_j4_salted" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "sum(l_quantity) AS sum_qty FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"),

    // salting must be result-invisible: the oracle is the PLAIN join
    // over the same skewed synth
    "q_j10_adaptive_salt" ->
      ("""WITH li AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0
         |  ELSE l_orderkey % 1000 END AS k, l_quantity FROM lineitem),
         |dim AS (SELECT DISTINCT k, k % 7 AS label FROM li)
         |SELECT label, count(*) AS n_items, sum(l_quantity) AS sum_qty
         |FROM li JOIN dim USING (k) GROUP BY label"""
        .stripMargin).replaceAll(raw"\s+", " "),

    "q_a7_cube" ->
      ("WITH o AS (SELECT o_orderpriority, " +
        "CAST(year(o_orderdate) AS INT) AS o_year, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
        "SELECT o_orderpriority, o_year, count(*) AS n_orders, " +
        "CAST(sum(cents) AS BIGINT) AS rev_cents FROM o " +
        "GROUP BY CUBE(o_orderpriority, o_year)"),

    "q_f_strings" ->
      ("SELECT c_custkey, upper(c_name) AS uname, " +
        "lower(c_mktsegment) AS lseg, " +
        "CAST(length(c_name) AS INT) AS name_len, " +
        "substring(c_name, 1, 10) AS name_prefix, " +
        "concat_ws('|', c_mktsegment, c_name) AS seg_name, " +
        "regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked, " +
        "lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key, " +
        "CAST(strpos(c_name, '#') AS INT) AS hash_pos FROM customer"),

    "q_j5_full_outer" ->
      ("SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders " +
        "FROM (SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey % 2 = 0) c FULL OUTER JOIN " +
        "(SELECT o_custkey, count(*) AS n_orders FROM orders " +
        "WHERE o_custkey % 3 = 0 GROUP BY 1) o ON c_custkey = o_custkey"),

    "q_j6_semi_anti" ->
      ("SELECT c_custkey, c_mktsegment, 'has_orders' AS tag FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "UNION ALL " +
        "SELECT c_custkey, c_mktsegment, 'no_orders' AS tag FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),

    "q_sq_subquery" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE CAST(round(o_totalprice*100) AS BIGINT) " +
        "* (SELECT count(*) FROM orders) " +
        "> (SELECT sum(CAST(round(o_totalprice*100) AS BIGINT)) FROM orders) " +
        "AND o_custkey IN (SELECT c_custkey FROM customer " +
        "WHERE c_mktsegment = 'BUILDING') " +
        "AND EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_quantity >= 45)"),

    "q_a8_gsets" ->
      ("WITH o AS (SELECT o_orderpriority, " +
        "CAST(year(o_orderdate) AS INT) AS o_year, " +
        "CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders) " +
        "SELECT o_orderpriority, o_year, " +
        "CAST(grouping(o_orderpriority) AS INT) AS g_pri, " +
        "CAST(grouping(o_year) AS INT) AS g_year, " +
        "count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS rev_cents " +
        "FROM o GROUP BY GROUPING SETS ((o_orderpriority, o_year), " +
        "(o_orderpriority), ())"),

    "q_f_nullcond" ->
      ("SELECT p_partkey, nullif(p_size % 5, 0) AS nz, " +
        "coalesce(nullif(p_size % 5, 0), -1) AS nz_filled, " +
        "least(p_size, 25) AS lo, greatest(p_size, 25) AS hi, " +
        "CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' " +
        "ELSE 'L' END AS size_class FROM part"),

    "q_w_frames" ->
      ("SELECT o_custkey, o_orderkey, " +
        "first_value(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key, " +
        "last_value(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND UNBOUNDED FOLLOWING) AS last_key, " +
        "nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND UNBOUNDED FOLLOWING) AS second_key, " +
        "lead(o_orderkey) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS next_key, " +
        "CAST(ntile(4) OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile FROM orders"),

    // both engines evaluate the same (r-1)/(n-1) and r/n doubles over
    // a total order, so the micros rounding is bit-identical
    "q_w_dist" ->
      ("WITH o AS (SELECT o_orderkey, o_orderpriority, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) " +
        "SELECT o_orderkey, o_orderpriority, cents, " +
        "CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micros, " +
        "CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micros " +
        "FROM o WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY cents, o_orderkey)"),

    // the oracle is the UNBUCKETED join: the layout must be invisible
    "q_j7_bucketed" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) " +
        "AS price_cents FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"),

    "q_s7_timetravel" ->
      ("SELECT 'v0' AS snap, count(*) AS n_rows, " +
        "CAST(sum(p_partkey) AS BIGINT) AS sum_key FROM part " +
        "WHERE p_size > 25 UNION ALL " +
        "SELECT 'v1' AS snap, count(*) AS n_rows, " +
        "CAST(sum(p_partkey) AS BIGINT) AS sum_key FROM part"),

    // restore must surface exactly the restored snapshot, twice (via
    // read() and via time travel), two commits after it
    "q_s19_restore" ->
      ("SELECT 'restored' AS snap, count(*) AS n_rows, " +
        "CAST(sum(p_partkey) AS BIGINT) AS sum_key, " +
        "CAST(2 AS BIGINT) AS latest_delta FROM part WHERE p_size > 25 " +
        "UNION ALL " +
        "SELECT 'v0' AS snap, count(*) AS n_rows, " +
        "CAST(sum(p_partkey) AS BIGINT) AS sum_key, " +
        "CAST(2 AS BIGINT) AS latest_delta FROM part WHERE p_size > 25"),

    // three live versions: two data generations, one restore whose
    // target is the first
    "q_s20_history" ->
      ("SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'data', CAST(0 AS BIGINT)), " +
        "(CAST(1 AS BIGINT), 'data', CAST(1 AS BIGINT)), " +
        "(CAST(2 AS BIGINT), 'restore', CAST(0 AS BIGINT))) " +
        "AS t(version, kind, target)"),

    // the metadata answer must equal the full-scan aggregate exactly
    "q_s23_meta_agg" ->
      ("SELECT count(*) AS n_rows, " +
        "CAST(sum(l_orderkey) AS BIGINT) AS sum_l_orderkey, " +
        "CAST(min(l_orderkey) AS BIGINT) AS min_l_orderkey, " +
        "CAST(max(l_orderkey) AS BIGINT) AS max_l_orderkey, " +
        "CAST(count(l_orderkey) AS BIGINT) AS cnt_l_orderkey " +
        "FROM lineitem"),

    // the quarantine counts replay the plant arithmetic: one bad line
    // per ten, good values are 3i
    "q_s22_csv_badrecords" ->
      ("""WITH nn AS (SELECT count(*) AS n FROM orders),
         |x AS (SELECT unnest(range(0, n)) AS i FROM nn),
         |g AS (SELECT i FROM x WHERE i % 10 <> 7)
         |SELECT (SELECT count(*) FROM g) AS n_good,
         |  (SELECT count(*) FROM x WHERE i % 10 = 7) AS n_bad,
         |  (SELECT CAST(sum(i * 3) AS BIGINT) FROM g) AS sum_v_good,
         |  (SELECT CAST(sum(i) AS BIGINT) FROM g) AS sum_id_good,
         |  (SELECT count(*) FROM x) AS n_named"""
        .stripMargin).replaceAll(raw"\s+", " "),

    // bloom skipping must be content-invisible: exactly the rows of
    // the three smallest keys, however few files were opened
    "q_s21_bloom_point" ->
      ("SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders " +
        "WHERE o_orderkey IN " +
        "(SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3)"),

    // every front-door route ≡ the plain filter over the raw table
    "q_s24_front_read" ->
      ("""WITH lo AS (SELECT min(o_orderkey) AS k FROM orders),
         |b AS (SELECT o_orderkey, round(o_totalprice, 2) AS price2,
         |  o_orderpriority FROM orders)
         |SELECT b.* FROM b, lo WHERE o_orderkey = lo.k
         |UNION ALL SELECT b.* FROM b, lo
         |  WHERE o_orderkey BETWEEN lo.k + 1 AND lo.k + 64
         |UNION ALL SELECT b.* FROM b, lo
         |  WHERE o_orderpriority = '1-URGENT'
         |  AND o_orderkey <= lo.k + 2048"""
        .stripMargin).replaceAll(raw"\s+", " "),

    // the planner-pruned plain-SQL read ≡ the raw filters
    "q_s26_planner_skip" ->
      ("""WITH lo AS (SELECT min(o_orderkey) AS k FROM orders),
         |b AS (SELECT o_orderkey, round(o_totalprice, 2) AS price2,
         |  o_orderpriority FROM orders)
         |SELECT b.* FROM b, lo WHERE o_orderkey = lo.k
         |UNION ALL SELECT b.* FROM b, lo
         |  WHERE o_orderkey BETWEEN lo.k + 1 AND lo.k + 64"""
        .stripMargin).replaceAll(raw"\s+", " "),

    // the planner-folded metadata aggregate ≡ raw-table aggregates.
    // avg is replayed as exact-sum / count in DOUBLE — the identical
    // IEEE division Spark's Average performs once its double
    // accumulation is exact (the fold's 2⁵³ bound guarantees it)
    "q_s27_planner_agg" ->
      ("SELECT count(*) AS n_rows, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderkey) AS min_k, max(o_orderkey) AS max_k, " +
        "count(o_orderkey) AS cnt_k, " +
        "CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS avg_k " +
        "FROM orders"),

    // both scopes ≡ plain SQL aggregates over the raw table
    "q_s25_front_agg" ->
      ("""WITH lo AS (SELECT min(o_orderkey) AS k FROM orders)
         |SELECT 'all' AS scope, count(*) AS n_rows,
         |  CAST(sum(o_orderkey) AS BIGINT) AS sum_o_orderkey,
         |  min(o_orderkey) AS min_o_orderkey,
         |  max(o_orderkey) AS max_o_orderkey FROM orders
         |UNION ALL SELECT 'interval', count(*),
         |  CAST(sum(o_orderkey) AS BIGINT), min(o_orderkey),
         |  max(o_orderkey)
         |  FROM orders, lo
         |  WHERE o_orderkey BETWEEN lo.k AND lo.k + 4096"""
        .stripMargin).replaceAll(raw"\s+", " "),

    // compaction must be content-invisible
    "q_s8_compact" -> "SELECT * FROM part",

    "q_s15_optimize_z" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",

    "q_j8_merge_evolve" ->
      ("SELECT c_custkey, CASE WHEN c_custkey % 3 = 0 " +
        "THEN c_name || '!' ELSE c_name END AS c_name, " +
        "CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END AS c_mktsegment " +
        "FROM customer"),

    "q_j9_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "q_cdc_apply" ->
      ("SELECT p_partkey, p_name, p_brand, p_type, p_size, " +
        "CASE WHEN p_partkey % 7 = 1 THEN p_retailprice * 3 " +
        "ELSE p_retailprice END AS p_retailprice FROM part " +
        "WHERE p_partkey % 7 <> 0 UNION ALL " +
        "SELECT p_partkey + 1000000, p_name, p_brand, p_type, p_size, " +
        "p_retailprice FROM part WHERE p_partkey % 7 = 2"),

    "q_s17_update" ->
      ("SELECT l_orderkey, l_linenumber, CASE WHEN l_orderkey BETWEEN " +
        "1000 AND 3000 THEN 99.0 ELSE l_quantity END AS l_quantity, " +
        "l_extendedprice FROM lineitem"),

    // the delete must be exact: manifest read ≡ full-scan anti-filter
    "q_s16_delete" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_orderkey NOT BETWEEN 1000 AND 3000"),

    // skipping must be invisible: pruned read ≡ full-scan filter
    "q_s9_skipping" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice " +
        "FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000")
  ) ++ StretchQueries.oracleSql
}
