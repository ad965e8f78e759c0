package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rules for the engine's kernels — injected via
  * [[graft.GraftExtensions]] so pure-SQL users get them without code
  * changes.
  */
object GraftRules {

  /** Rewrite unbounded edit-distance threshold predicates to Spark's
    * BOUNDED Levenshtein: `levenshtein(a, b) <= k` computes the full
    * O(|a|·|b|) DP however far apart the strings are, but a predicate
    * only needs to know "within k?" — the 3-arg form runs the banded
    * O(k·min) DP and bails out (returning -1) the moment the distance
    * provably exceeds k. On a fuzzy-match pair stream most pairs are
    * NOT matches, so most evaluations take the early exit.
    *
    * The -1 overflow sentinel is the trap: a naive
    * `levenshtein(a,b,k) <= k` rewrite would ACCEPT every
    * over-threshold pair (-1 ≤ k). The rewrite therefore guards with
    * `>= 0`:
    *
    *   lev(a,b) <= k   ⟺   lev(a,b,k) >= 0 AND lev(a,b,k) <= k
    *
    * (codegen's common-subexpression elimination evaluates the bounded
    * kernel once). Only literal non-negative integer bounds rewrite —
    * a column bound has no static band to run.
    */
  object BoundedLevenshtein extends Rule[LogicalPlan] {
    private def bounded(
        lev: Levenshtein, k: Expression): Expression = {
      val b = Levenshtein(lev.left, lev.right, Some(k))
      And(GreaterThanOrEqual(b, Literal(0)), LessThanOrEqual(b, k))
    }
    private def isBound(e: Expression): Boolean = e match {
      case Literal(v: Int, IntegerType) => v >= 0
      case _                            => false
    }
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case LessThanOrEqual(lev: Levenshtein, k)
            if lev.threshold.isEmpty && isBound(k) => bounded(lev, k)
        case GreaterThanOrEqual(k, lev: Levenshtein)
            if lev.threshold.isEmpty && isBound(k) => bounded(lev, k)
        case LessThan(lev: Levenshtein, k @ Literal(v: Int, IntegerType))
            if lev.threshold.isEmpty && v >= 1 =>
          val km1 = Literal(v - 1)
          val b = Levenshtein(lev.left, lev.right, Some(km1))
          And(GreaterThanOrEqual(b, Literal(0)), LessThan(b, k))
      }
  }

  /** Planner-gated file skipping (round-10 VERDICT #1): rewrite a
    * `Filter` over a plain parquet scan of a MANIFEST-BACKED table to
    * scan only the files the manifest's skipping structures keep —
    * the same bloom (equality) / min-max (range) routing
    * [[graft.engine.Layout.read]] performs for API callers, surfaced
    * to pure SQL: `SELECT … FROM parquet.`/t` WHERE k = 5` opens ~1
    * file of 30k instead of all of them, with zero engine imports.
    *
    * Correctness envelope:
    *  - the Filter node is KEPT — pruning only shrinks the file set,
    *    and the kept set is always a superset of the files containing
    *    matching rows (bloom false positives and relaxed strict
    *    bounds cost a wasted open, never a wrong row);
    *  - only null-rejecting bounds (`=`, `<`, `<=`, `>`, `>=` against
    *    a literal on a bare column) extract — `<=>` would match NULLs
    *    that the null-ignoring min/max stats can't see;
    *  - a rewritten scan reads the MANIFEST's view of the table, which
    *    is the visibility contract of a manifest-maintained table
    *    (see [[graft.engine.Layout.deleteMatching]]: unlisted files
    *    are garbage awaiting vacuum, not data);
    *  - a PLANNER rewrite additionally requires the manifest's file
    *    set to EQUAL the directory's ([[Layout.manifestFileNames]] vs
    *    the relation's `inputFiles` basenames): a pure-SQL
    *    `parquet.`/t`` scan is a directory read by the user's own
    *    words, and the manifest-view argument above only covers the
    *    deleted-file direction — files appended out-of-band after
    *    writeFileStats would otherwise be silently dropped. API
    *    callers who WANT manifest visibility use
    *    [[graft.engine.Layout.read]]/`manifestRead`, which keep it;
    *  - any error in the hooks leaves the plan untouched (the
    *    unrewritten plan is always correct), and the rewrite is
    *    skipped unless it strictly shrinks the file count;
    *  - idempotent: the pruned scan's [[GraftPrunedFileIndex]] marks
    *    it ineligible, so the optimizer's fixpoint batches fire the
    *    manifest probe at most once per (table, bounds) — and
    *    [[graft.engine.Layout.plannerKeptFiles]] memoizes the
    *    decision keyed by a manifest fingerprint, so repeated runs of
    *    the same query cost one FS stat, not a manifest job.
    *
    * Disable with `graft.planner.manifestSkip=false`.
    */
  class ManifestSkip(spark: org.apache.spark.sql.SparkSession)
      extends Rule[LogicalPlan] with PredicateHelper {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    import graft.engine.Layout

    private def enabled: Boolean =
      conf.getConfString("graft.planner.manifestSkip", "true") == "true"

    /** Single-root, unpartitioned, not itself a manifest, not already
      * pruned — then (and only then) pay the one-`exists` probe.
      */
    private def eligible(r: HadoopFsRelation): Boolean =
      r.partitionSchema.isEmpty &&
        r.location.rootPaths.length == 1 &&
        !r.location.isInstanceOf[GraftPrunedFileIndex] &&
        !r.location.rootPaths.head.getName.endsWith("__stats") && {
          Layout.hasManifest(spark, r.location.rootPaths.head.toString)
        }

    private def scalaValue(l: Literal): Option[Any] =
      Option(l.value).map(
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(_, l.dataType))

    /** The null-rejecting literal bounds of one conjunct, on bare
      * column references only (a Cast around the column means the
      * literal's type is NOT the stored type — hashing or comparing
      * it against the stats could silently mis-prune; leave those to
      * the ordinary scan).
      */
    private def boundsOf(e: Expression): Seq[Layout.PlannerBound] = e match {
      case EqualTo(a: AttributeReference, l: Literal) =>
        scalaValue(l).map(Layout.BoundEq(a.name, _)).toSeq
      case EqualTo(l: Literal, a: AttributeReference) =>
        scalaValue(l).map(Layout.BoundEq(a.name, _)).toSeq
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        scalaValue(l).map(Layout.BoundLo(a.name, _)).toSeq
      case GreaterThan(a: AttributeReference, l: Literal) =>
        scalaValue(l).map(Layout.BoundLo(a.name, _)).toSeq
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        scalaValue(l).map(Layout.BoundHi(a.name, _)).toSeq
      case LessThan(a: AttributeReference, l: Literal) =>
        scalaValue(l).map(Layout.BoundHi(a.name, _)).toSeq
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        scalaValue(l).map(Layout.BoundHi(a.name, _)).toSeq
      case GreaterThan(l: Literal, a: AttributeReference) =>
        scalaValue(l).map(Layout.BoundHi(a.name, _)).toSeq
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        scalaValue(l).map(Layout.BoundLo(a.name, _)).toSeq
      case LessThan(l: Literal, a: AttributeReference) =>
        scalaValue(l).map(Layout.BoundLo(a.name, _)).toSeq
      // IN-lists: a null element never ADDS a match (NULL = x is
      // never TRUE), so probing only the non-null values is sound;
      // any non-literal element bails the whole bound. The optimizer
      // rewrites long lists to InSet before this rule runs in its
      // second batch — handle both shapes.
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.flatMap(l => scalaValue(l.asInstanceOf[Literal]))
        if (vs.nonEmpty) Seq(Layout.BoundIn(a.name, vs)) else Nil
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(a.dataType)
        val vs = hset.toSeq.filter(_ != null).map(conv)
        if (vs.nonEmpty) Seq(Layout.BoundIn(a.name, vs)) else Nil
      // NOT StartsWith/LIKE-prefix: it would need string range stats,
      // and the manifest tracks min/max only for summable (numeric)
      // columns — strings skip through blooms (equality/IN) only.
      case _ => Nil
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled) plan
      else plan.transform {
        case f @ Filter(cond,
            l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
            if splitConjunctivePredicates(cond)
              .exists(boundsOf(_).nonEmpty) && eligible(r) =>
          val bounds = splitConjunctivePredicates(cond).flatMap(boundsOf)
          val table = r.location.rootPaths.head.toString
          if (!ManifestAggHelper.manifestMatchesDir(spark, table, r)) f
          else Layout.plannerKeptFiles(spark, table, bounds) match {
            case Some(kept) if kept.length < r.location.inputFiles.length =>
              val idx = new GraftPrunedFileIndex(spark,
                kept.map(new org.apache.hadoop.fs.Path(_)), r.dataSchema)
              val pruned = l.copy(
                relation = r.copy(location = idx)(spark))
              Filter(cond, pruned)
            case _ => f // untracked column, stale/no gain, or error
          }
      }
  }

  /** Aggregate pushdown to the manifest for pure SQL (the
    * [[graft.engine.Layout.readAgg]] metadata route, planner-gated):
    * a global (no GROUP BY, no filter, no DISTINCT) aggregate of
    * count(*) / count(col) / min / max / sum over a manifest-backed
    * parquet scan is answered from the manifest at OPTIMIZATION time
    * and replaced by a one-row LocalRelation — zero data files
    * opened, the Delta "metadata-only count" idea extended to
    * sum/min/max/count(col) and surfaced to `SELECT count(*) FROM
    * parquet.`/t``.
    *
    * Exactness: the manifest rows are maintained by the same writers
    * that move data (writeFileStats / the DML rewrite path), and
    * [[graft.engine.Layout.metadataAgg]]'s scaladoc carries the
    * per-function null-semantics proof. The rewrite additionally
    * requires the manifest-served value's type to EQUAL the
    * aggregate's result type — a mismatch (e.g. a pre-v4 manifest)
    * bails to the ordinary plan rather than casting. Any error →
    * plan untouched. Shares `graft.planner.manifestSkip` as its kill
    * switch (one flag governs planner-manifest integration).
    */
  class ManifestAgg(spark: org.apache.spark.sql.SparkSession)
      extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, LocalRelation, Project}
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    import graft.engine.Layout

    private def enabled: Boolean =
      conf.getConfString("graft.planner.manifestSkip", "true") == "true"

    private def relationOf(plan: LogicalPlan): Option[HadoopFsRelation] =
      plan match {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _) => Some(r)
        // column pruning's bare-attribute Project is transparent
        case Project(ps, LogicalRelation(r: HadoopFsRelation, _, _, _, _))
            if ps.forall(_.isInstanceOf[AttributeReference]) => Some(r)
        case _ => None
      }

    private def eligible(r: HadoopFsRelation): Boolean =
      r.partitionSchema.isEmpty &&
        r.location.rootPaths.length == 1 &&
        !r.location.rootPaths.head.getName.endsWith("__stats") &&
        Layout.hasManifest(spark, r.location.rootPaths.head.toString)

    /** (served-aggregate spec, output attribute) per result
      * expression, or None if any expression is not a plain complete
      * non-distinct servable aggregate.
      */
    private def planServes(aggs: Seq[NamedExpression])
        : Option[Seq[(ManifestAggHelper.ServedAgg, Attribute)]] = {
      val served = aggs.map {
        case a @ Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
          ManifestAggHelper.servedBy(fn).map((_, a.toAttribute))
        case _ => None
      }
      if (served.forall(_.isDefined)) Some(served.flatten) else None
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled) plan
      else plan.transform {
        case agg @ Aggregate(Nil, aggExprs, child, _)
            if relationOf(child).exists(eligible) &&
              planServes(aggExprs).isDefined =>
          val served = planServes(aggExprs).get
          val rel = relationOf(child).get
          val table = rel.location.rootPaths.head.toString
          if (!ManifestAggHelper.manifestMatchesDir(spark, table, rel)) agg
          else try {
            val res = Layout.metadataAgg(spark, table)
            val schema = res.schema
            val covered = served.forall { case (sa, out) =>
              ManifestAggHelper.covers(sa, out, schema)
            }
            if (!covered) agg
            else {
              val row = res.head()
              val values = served.map { case (sa, out) =>
                org.apache.spark.sql.catalyst.CatalystTypeConverters
                  .createToCatalystConverter(out.dataType)(
                    ManifestAggHelper.valueOf(sa, row))
              }
              LocalRelation(agg.output,
                Seq(org.apache.spark.sql.catalyst.InternalRow
                  .fromSeq(values)))
            }
          } catch { case scala.util.control.NonFatal(_) => agg }
      }
  }
}

object ManifestAggHelper {
  import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

  /** How one aggregate call is served from the manifest: directly by
    * one manifest column, or (avg) derived from an exactly-served
    * sum/count pair.
    */
  sealed trait ServedAgg
  final case class Direct(col: String) extends ServedAgg
  final case class AvgOf(sumCol: String, cntCol: String,
                         minCol: String, maxCol: String) extends ServedAgg

  /** The manifest serving spec for one aggregate call, or None when
    * the call shape isn't manifest-servable.
    */
  private[plans] def servedBy(
      fn: org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateFunction): Option[ServedAgg] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    fn match {
      // the literal must be NON-NULL: count(NULL) is 0, not the row
      // count — n_rows only serves count(*) / count(<non-null lit>)
      case Count(Seq(Literal(v, _))) if v != null => Some(Direct("n_rows"))
      case Count(Seq(a: AttributeReference)) => Some(Direct(s"cnt_${a.name}"))
      case Min(a: AttributeReference) => Some(Direct(s"min_${a.name}"))
      case Max(a: AttributeReference) => Some(Direct(s"max_${a.name}"))
      case Sum(a: AttributeReference, _) => Some(Direct(s"sum_${a.name}"))
      // avg = exactly-served sum / exactly-served non-null count.
      // min/max ride along to bound the summation (see covers)
      case Average(a: AttributeReference, _) =>
        Some(AvgOf(s"sum_${a.name}", s"cnt_${a.name}",
          s"min_${a.name}", s"max_${a.name}"))
      case _ => None
    }
  }

  /** Is `sa` exactly served by this manifest-aggregate schema for an
    * output of `out.dataType`? Direct requires name + type equality
    * (no casting — a pre-v4 manifest bails). AvgOf requires the
    * integral-sum shape: a LongType manifest sum/count pair and a
    * DoubleType output — Spark's own Average over an integral column
    * accumulates in DOUBLE, which equals the exact integer sum only
    * while every partial sum is integer-representable in double, so
    * the VALUE check in [[valueOf]] additionally bounds
    * count·max(|min|,|max|) < 2⁵³ before trusting the fold. Double
    * and decimal inputs never fold: their table-side sums are
    * order-dependent / differently-typed, and the unrewritten plan is
    * always correct.
    */
  private[plans] def covers(sa: ServedAgg, out: Attribute,
                            schema: StructType): Boolean = sa match {
    case Direct(c) =>
      schema.fields.exists(f => f.name == c && f.dataType == out.dataType)
    case AvgOf(s, c, mn, mx) =>
      out.dataType == DoubleType &&
        Seq(s, mn, mx).forall(n =>
          schema.fields.exists(f => f.name == n && f.dataType == LongType)) &&
        schema.fields.exists(f => f.name == c && f.dataType == LongType)
  }

  /** The Scala value serving `sa` from the manifest-aggregate row.
    * Throws (→ the rule's catch bails to the ordinary plan) when an
    * AvgOf's exactness bound fails.
    */
  private[plans] def valueOf(sa: ServedAgg,
                             row: org.apache.spark.sql.Row): Any = sa match {
    case Direct(c) => row.get(row.fieldIndex(c))
    case AvgOf(s, c, mn, mx) =>
      val cnt = row.getLong(row.fieldIndex(c))
      if (cnt == 0L) null
      else {
        val lo = row.getLong(row.fieldIndex(mn))
        val hi = row.getLong(row.fieldIndex(mx))
        val bound = math.max(math.abs(lo), math.abs(hi))
        // every prefix of Spark's double summation is ≤ cnt·max|v|;
        // below 2^53 all prefixes are exact integers, so the double
        // accumulation ≡ the manifest's exact long sum in ANY order
        require(bound <= 0L || cnt <= (1L << 53) / bound,
          s"avg fold exactness bound exceeded: $cnt rows of |v| ≤ $bound")
        row.getLong(row.fieldIndex(s)).toDouble / cnt.toDouble
      }
  }

  /** The planner rewrites' consistency gate: true iff the manifest's
    * file-name set EQUALS the relation's actual input-file basenames.
    * Out-of-band appends (data-dir files the manifest never saw) and
    * manifest-only rows (files deleted out-of-band) both fail the
    * probe, so the rewrite falls back to the ordinary directory scan
    * the SQL literally asked for. The manifest side is memoized by
    * fingerprint; the directory side comes fresh from the relation on
    * every optimizer invocation, so no memo can serve a decision
    * across a data-dir change.
    */
  private[plans] def manifestMatchesDir(
      spark: org.apache.spark.sql.SparkSession, tablePath: String,
      r: org.apache.spark.sql.execution.datasources.HadoopFsRelation)
      : Boolean =
    graft.engine.Layout.manifestFileNames(spark, tablePath).exists { mf =>
      val dirNames = r.location.inputFiles
        .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
      mf == dirNames
    }
}

/** Marker FileIndex for a [[GraftRules.ManifestSkip]]-pruned scan:
  * behaviorally a plain [[InMemoryFileIndex]] over the kept files
  * (each root path IS a data file, so no discovery or partition
  * inference happens), but its TYPE is the rule's idempotence guard —
  * a relation already carrying one is never re-probed.
  */
class GraftPrunedFileIndex(
    spark: org.apache.spark.sql.SparkSession,
    keptFiles: Seq[org.apache.hadoop.fs.Path],
    schema: org.apache.spark.sql.types.StructType)
  extends org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
    spark, keptFiles, Map.empty, Some(schema))
