package graft.plans

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}

/** Hive materializes a WITH definition referenced at least
  * `hive.optimize.cte.materialize.threshold` times as a temp table and
  * rewrites the references to scan it (ref ql/parse/SemanticAnalyzer
  * .java:1560 `materializeCTE`, :2256 threshold gate) — at warehouse
  * scale a 3×-referenced expensive CTE is otherwise a 3× scan. Spark
  * inlines every reference, and ReuseExchange only dedups IDENTICAL
  * physical subtrees after planning, which repeated-CTE-with-different-
  * downstream-filters defeats.
  *
  * This front-door rewrite (Engine.sql, gated by
  * `spark.graft.cte.materializeThreshold`, OFF by default to match
  * Spark's canonical inlining) evaluates each qualifying definition ONCE
  * into a staged parquet directory — the same shape as Hive's temp-TABLE
  * materialization, and the scale-safe one: the materialized rows live
  * on the filesystem, not in executor memory, so they compete with
  * nothing and survive executor loss (a localCheckpoint's blocks die
  * with their executor and FAIL the query — non-recomputable lineage).
  * Every reference substitutes with an ordinary pruned/vectorized scan
  * of the staging dir. The rare frame parquet can't hold (NullType /
  * interval columns) falls back to a localCheckpoint with the old
  * caveat. Definitions below the threshold inline exactly as
  * CTESubstitution would. References resolve correctly in self-joins:
  * a parquet relation is a `MultiInstanceRelation`, so the analyzer's
  * DeduplicateRelations re-keys repeated instances.
  *
  * Staging lifetime: Hive drops the temp table when the query completes;
  * a lazy DataFrame has no statement-end hook, so staged dirs live under
  * one session-scoped root (`spark.graft.cte.materializeDir`, default
  * java.io.tmpdir/graft_cte_<sessionUUID>) deleted on JVM exit, and
  * [[release]] drops them eagerly (callers that drain statements
  * synchronously can call it between statements).
  *
  * Conservative by construction — a plan is left untouched (same
  * instance, so callers' `eq` fast paths hold) unless ALL of:
  *  - the flag sets a threshold >= 1;
  *  - the plan's root is the only `UnresolvedWith` in the tree (nested
  *    WITH shadowing could change which definition a name means);
  *  - definition names are distinct and the WITH is not recursive
  *    (output-column aliases `WITH t(a, b) AS ...` are fine — they parse
  *    inside the definition's alias and materialize with it);
  *  - definitions are already in dependency order (Engine.sql runs
  *    [[CteForwardRefs]] first, which guarantees it for acyclic graphs).
  *
  * Run AFTER authz checks and policy substitution: materialization
  * executes the definition, which must never happen before the
  * statement's privileges are adjudicated.
  */
object CteMaterialize {

  val ThresholdKey = "spark.graft.cte.materializeThreshold"
  val DirKey = "spark.graft.cte.materializeDir"

  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  // session -> staged dirs, for eager release (weak keys: a dropped
  // session's entry goes with it); the root dir is also registered for
  // JVM-exit deletion the first time a session stages
  private val staged =
    new java.util.WeakHashMap[SparkSession, List[java.io.File]]()
  private val hooked = scala.collection.mutable.Set[String]()

  private def stagingRoot(spark: SparkSession): java.io.File =
    new java.io.File(spark.conf.getOption(DirKey).getOrElse(
      sys.props("java.io.tmpdir") + "/graft_cte_" +
        spark.sparkContext.applicationId + "_" +
        java.lang.Integer.toHexString(System.identityHashCode(spark))))

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree(_))
    f.delete()
  }

  /** Drop every staging dir this session materialized (safe only once
    * the statements that referenced them are fully consumed).
    */
  def release(spark: SparkSession): Unit = synchronized {
    Option(staged.remove(spark)).getOrElse(Nil).foreach(rmTree(_))
  }

  /** Evaluate `df` once into a staged parquet dir and return a scan of
    * it; frames parquet can't store fall back to a localCheckpoint.
    */
  private def materialize(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val root = stagingRoot(spark)
    val dir = new java.io.File(root, java.util.UUID.randomUUID().toString)
    try {
      df.write.parquet(dir.toString)
      synchronized {
        staged.put(spark,
          dir :: Option(staged.get(spark)).getOrElse(Nil))
        if (hooked.add(root.toString))
          Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(root)))
      }
      spark.read.schema(df.schema).parquet(dir.toString)
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition)
            .exists(_.startsWith("UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE")) ||
            e.getMessage.contains("does not support") ||
            e.getMessage.contains("doesn't support") =>
        // NullType/interval columns: parquet refuses pre-execution (Spark
        // 4.1 emits UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE, message wording
        // "doesn't support"), so nothing was written — pin rows as RDD
        // blocks instead
        df.localCheckpoint()
    }
  }

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    val threshold = spark.conf.getOption(ThresholdKey)
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(-1)
    if (threshold < 1) return plan
    plan match {
      case w: UnresolvedWith if eligible(w) => rewrite(spark, w, threshold)
      case _ => plan
    }
  }

  private def eligible(w: UnresolvedWith): Boolean = {
    val names = w.cteRelations.map(r => norm(r._1))
    if (names.distinct.size != names.size) return false
    // recursive CTEs keep their spelling (output-column aliases need no
    // bail-out: they parse INSIDE the definition's SubqueryAlias and
    // substitute with it); the per-definition recursion marker likewise
    if (w.allowRecursion || w.cteRelations.exists(_._3.isDefined))
      return false
    val anyNested = (w.child +: w.cteRelations.map(_._2: LogicalPlan))
      .exists(_.collectWithSubqueries { case _: UnresolvedWith => () }.nonEmpty)
    !anyNested
  }

  /** Occurrences of each definition name across the main child and LATER
    * definitions (defs are in dependency order, so earlier defs cannot
    * reference later ones).
    */
  private def refCounts(w: UnresolvedWith): Map[String, Int] = {
    val names = w.cteRelations.map(r => norm(r._1)).toSet
    val counts = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    def tally(p: LogicalPlan): Unit = p.foreachWithSubqueries {
      case r: UnresolvedRelation if r.multipartIdentifier.size == 1 =>
        val n = norm(r.multipartIdentifier.head)
        if (names.contains(n)) counts(n) += 1
      case _ => ()
    }
    tally(w.child)
    w.cteRelations.foreach { case (_, d, _) => tally(d) }
    counts.toMap.withDefaultValue(0)
  }

  /** Replace single-part references to mapped names with the mapped plan
    * under a preserving alias — recursing into subquery expressions.
    */
  private def subst(p: LogicalPlan,
      map: Map[String, LogicalPlan]): LogicalPlan = {
    val replaced = p transformDown {
      case r: UnresolvedRelation if r.multipartIdentifier.size == 1 &&
          map.contains(norm(r.multipartIdentifier.head)) =>
        val n = r.multipartIdentifier.head
        SubqueryAlias(n, map(norm(n)))
    }
    replaced transformAllExpressions {
      case sq: SubqueryExpression => sq.withNewPlan(subst(sq.plan, map))
    }
  }

  private def rewrite(spark: SparkSession, w: UnresolvedWith,
      threshold: Int): LogicalPlan = {
    val counts = refCounts(w)
    if (!w.cteRelations.exists(r => counts(norm(r._1)) >= threshold))
      return w // nothing qualifies — Spark's canonical inlining stands
    // dependency order: each definition sees its predecessors substituted
    val map = scala.collection.mutable.Map[String, LogicalPlan]()
    w.cteRelations.foreach { case (name, defPlan, _) =>
      val resolvedDef = subst(defPlan, map.toMap)
      map(norm(name)) =
        if (counts(norm(name)) >= threshold) {
          // evaluate ONCE; the staged relation replaces every reference
          // (eager — Hive's materialization step is also an upfront
          // execution of the definition)
          materialize(spark,
            org.apache.spark.sql.GraftShims.ofRows(spark, resolvedDef))
            .queryExecution.logical
        } else resolvedDef
    }
    subst(w.child, map.toMap)
  }
}
