package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import graft.core.GraftEngine

/** Session extension wiring for the graft DSv2 surface:
  *
  *  - [[GraftRelationRewrite]] (analyzer): a `DataSourceV2Relation` over a
  *    [[GraftTable]] becomes the engine's serving-view logical plan —
  *    version pointer + RT overlay + write-compute fold + A/A resolution,
  *    all as ordinary Catalyst the optimizer can push into.
  *  - [[GraftBucketPruning]] (optimizer): a full-key equality predicate
  *    sitting on a store's bucketed parquet scan gains the derived
  *    `__bucket = md5mod(key)` predicate, so the scan prunes to ONE
  *    partition directory — the connector-path analog of
  *    `GraftEngine.get`'s explicit routing, and the Spark analog of Venice
  *    routing a key to exactly its partition's replica.
  *
  * Install with `spark.sql.extensions=graft.sources.GraftExtensions` (a
  * stock Spark mechanism — no graft API calls in user code). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(GraftRelationRewrite)
    ext.injectOptimizerRule(GraftBucketPruning)
    // the compute DSL as plain SQL functions (graft_dot, graft_cosine, …)
    // — with the relation rewrite above, spark.sql alone is a full client
    graft.functions.SqlFunctions.all.foreach(ext.injectFunction)
  }
}

/** Analysis-time substitution of graft relations by the serving-view plan.
  * The rewrite preserves the relation's output attribute ids (an aliasing
  * Project), so references bound by the analyzer stay valid. */
case class GraftRelationRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Alias `view`'s outputs onto the relation's attribute ids so
    * references the analyzer already bound stay valid. */
  private def rebind(refs: Seq[Attribute], view: LogicalPlan,
      what: String): LogicalPlan = {
    val byName = view.output.map(a => a.name -> a).toMap
    Project(refs.map { ref =>
      val src = byName.getOrElse(ref.name,
        throw new IllegalStateException(
          s"$what no longer serves column ${ref.name}"))
      Alias(src, ref.name)(exprId = ref.exprId)
    }, view)
  }

  private def sinceTs(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): Long =
    options.getLong("sinceTs", 0L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a relation that is the TARGET of a write command must stay a real
    // DSv2 relation (the V1-write exec resolves the table from it); only
    // read-side occurrences become the serving-view plan. Identity-based:
    // `INSERT INTO t SELECT … FROM t` still rewrites the read occurrence.
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        writeTargets.add(w.table); ()
      case _ => ()
    }
    plan.transformUp {
      case rel @ DataSourceV2Relation(t: GraftTable, _, _, _, _, _)
          if !writeTargets.contains(rel) =>
        val engine = new GraftEngine(spark, t.root)
        // time travel: `.option("asOfTs", t)` or the catalog's SQL
        // `TIMESTAMP AS OF` pins a past instant — the snapshot version
        // plus only log entries at/before t (version dirs are immutable,
        // so this is free); `VERSION AS OF n` pins snapshot version n
        // with the live log overlaid (the rollback-preview read).
        val asOf = t.asOfTs.orElse(
          Option(rel.options.get("asOfTs")).map(_.toLong))
        val view =
          if (asOf.isEmpty && t.pinVersion.isEmpty)
            engine.servingView(t.store).queryExecution.analyzed
          else {
            require(!engine.isActiveActive(t.store),
              s"store ${t.store} is active-active — time travel pins the " +
                "LWW log prefix; use GraftEngine.servingView for A/A stores")
            engine.servingViewAsOf(t.store, asOf.getOrElse(Long.MaxValue),
              t.pinVersion).queryExecution.analyzed
          }
        rebind(rel.output, view, s"store ${t.store}")
      // batch changelog: every change event since `sinceTs` (A/A stores
      // emit conflict-resolved after-images, like GraftEngine.changelog)
      case rel @ DataSourceV2Relation(t: GraftChangelogTable, _, _, _, _, _) =>
        val view = new GraftEngine(spark, t.root)
          .changelog(t.store, sinceTs(rel.options))
          .queryExecution.analyzed
        rebind(rel.output, view, s"changelog of ${t.store}")
      // streaming changelog: substitute the parquet file source over the
      // store's upsert log — MicroBatchExecution then runs a stock file
      // stream (offset log = checkpointing; restarts resume in place).
      case rel @ StreamingRelationV2(_, _, t: GraftChangelogTable,
          options, _, _, _, _) =>
        val engine = new GraftEngine(spark, t.root)
        if (engine.isActiveActive(t.store))
          throw new UnsupportedOperationException(
            s"store ${t.store} is active-active: its changelog is a " +
              "conflict-resolved after-image computed per batch, not a " +
              "file stream — poll GraftEngine.changelog/bootstrapChangelog " +
              "with ChangeCoordinate checkpoints instead")
        val logDir = s"${t.root}/${t.store}/log"
        val schema = spark.read.parquet(logDir).schema
        val stream = spark.readStream.schema(schema).parquet(logDir)
          .filter(col(GraftEngine.TsCol) >= sinceTs(options))
        rebind(rel.output, stream.queryExecution.analyzed,
          s"changelog of ${t.store}")
    }
  }
}

/** Optimizer rule: derive bucket-partition pruning from full-key equality.
  *
  * Matches a `Filter` directly over a bucketed store scan (a parquet
  * relation whose output carries the `__bucket` partition column and whose
  * directory carries the per-version `_NBUCKETS` marker written at push
  * time — the version's OWN modulus, which survives rebucketing of later
  * versions). When the predicate pins every key column to a literal, the
  * key's bucket is computed driver-side with the same md5-mod as the
  * writer, and `__bucket = b` is appended — partition pruning then drops
  * every other bucket directory from the scan.
  *
  * Operator-optimization batch placement means predicate pushdown has
  * already run to fixpoint, so key equalities authored anywhere above the
  * store (including through the serving view's union and aggregation) have
  * reached the scan by the time this fires. */
case class GraftBucketPruning(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (keyCols, nBuckets) when `rel` scans exactly one graft version dir
    * carrying its _NBUCKETS marker, with the store's KEYS beside it. */
  private def storeLayout(rel: HadoopFsRelation): Option[(Seq[String], Int)] = {
    val roots = rel.location.rootPaths
    if (roots.length != 1) return None
    val vdir = Paths.get(roots.head.toUri.getPath)
    val marker = vdir.resolve("_NBUCKETS")
    val keys = vdir.getParent match {
      case null => return None
      case p => p.resolve("KEYS")
    }
    if (!Files.isRegularFile(marker) || !Files.isRegularFile(keys)) None
    else Some((Files.readString(keys).trim.split(",").toSeq,
      Files.readString(marker).trim.toInt))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case f @ Filter(cond, l @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _))
          if l.output.exists(_.name == GraftEngine.BucketCol) &&
            !cond.references.exists(_.name == GraftEngine.BucketCol) =>
        storeLayout(rel) match {
          case None => f
          case Some((keyCols, nb)) =>
            val eqs: Map[String, Any] = conjuncts(cond).collect {
              case EqualTo(a: Attribute, Literal(v, _)) if v != null =>
                a.name -> v
              case EqualTo(Literal(v, _), a: Attribute) if v != null =>
                a.name -> v
            }.toMap
            if (!keyCols.forall(eqs.contains)) f
            else {
              // literal rendering must match the writer's string cast:
              // UTF8String/numeric toString both align with Spark's cast
              val b = GraftEngine.bucketHashOf(
                keyCols.map(k => eqs(k).toString), nb)
              val bucketAttr =
                l.output.find(_.name == GraftEngine.BucketCol).get
              Filter(And(cond,
                EqualTo(bucketAttr, Literal(b))), l)
            }
        }
    }
}
