package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for graft stores — the reference's own integration
  * direction (expose store data to an external SQL engine; semantics, not
  * code: integrations/venice-duckdb/.../DuckDBDaVinciRecordTransformer.java:42,
  * AvroToSQL.java:66-105). Vanilla Spark reads a store with
  *
  * {{{
  *   spark.read.format("graft")
  *     .option("root", "/stores").option("store", "user_features").load()
  * }}}
  *
  * or through the catalog (`spark.sql.catalog.g=graft.sources.GraftCatalog`,
  * `spark.sql.catalog.g.root=/stores` → `SELECT * FROM g.user_features`) —
  * no graft API calls anywhere.
  *
  * Execution model: the relation is REWRITTEN at analysis time into the
  * engine's serving-view logical plan ([[GraftExtensions]]), so the read is
  * full-parity with `GraftEngine.servingView` by construction — current
  * version resolution, RT-log LWW overlay with delete-wins, write-compute
  * fold, A/A CRDT resolution, schema-superset conform — and everything
  * downstream is ordinary Catalyst: filters push into the parquet scans,
  * columns prune, and the [[GraftBucketPruning]] optimizer rule turns
  * full-key equality predicates into partition-directory pruning on the
  * store's md5-mod bucket layout. This beats a row-level DSv2 reader at
  * every scale point: the snapshot stays on Spark's vectorized parquet
  * path inside WholeStageCodegen instead of a per-row PartitionReader. */
final case class GraftTable(root: String, store: String,
    tableSchema: StructType,
    // SQL-standard time travel (`SELECT … FROM g.store TIMESTAMP AS OF t`
    // / `VERSION AS OF n`): the catalog's loadTable(ident, time/version)
    // overloads pin the read here, and the analysis-time rewrite serves
    // servingViewAsOf instead of servingView. asOfTs in epoch MILLIS.
    asOfTs: Option[Long] = None,
    pinVersion: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$root/$store"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      // writes ride the V1 fallback (the sanctioned whole-DataFrame write
      // seam): overwrite = a full push creating a NEW version, append = a
      // nearline put — df.write IS the push job, which is exactly what the
      // reference's VenicePushJob is (a Spark job writing a store version;
      // semantics, not code: AbstractDataWriterSparkJob.java). Any-schema
      // because an overwrite push may legitimately evolve the value schema.
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  // Never reached when GraftExtensions is installed — the analyzer rule
  // replaces the relation before scan planning. Reaching it means the
  // session was built without the extension; fail with the remedy.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      "graft tables are served through an analysis-time rewrite; add " +
        "spark.sql.extensions=graft.sources.GraftExtensions to the session " +
        "config (GraftSession.build does this automatically)")
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    GraftWriteBuilder(root, store, tableSchema, info, overwrite = false)
}

/** `df.write.format("graft")` — the push-job/nearline-write surface.
  *
  *  - `.mode("overwrite")` → [[graft.core.GraftEngine.push]]: a NEW store
  *    version written bucketed+sorted and atomically version-swapped (the
  *    VenicePushJob lifecycle). `.option("numBuckets", n)` sizes the
  *    layout (default: the engine's default modulus).
  *  - `.mode("append")` → `put` (or `putAA` on an active-active store): a
  *    nearline write batch stamped `.option("tsMs", t)`, defaulting to
  *    wall-clock — Venice's producer-timestamp behavior.
  *
  * The store must already exist: creation is an admin operation
  * (`GraftEngine.createStore`), exactly as Venice refuses pushes to
  * undeclared stores. Implemented as a V1 write (InsertableRelation): the
  * engine's writers are whole-DataFrame plans (bucketing, sorting, log
  * layout), which a row-level DataWriter cannot express. */
private[sources] final case class GraftWriteBuilder(root: String,
    store: String,
    tableSchema: StructType,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    overwrite: Boolean)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder =
    copy(overwrite = true)

  /** ACCEPT_ANY_SCHEMA skips Spark's output-column resolution, so
    * `INSERT INTO … VALUES` arrives with positional names (col1, col2, …)
    * the engine's by-name conform would null out. Same-arity inputs whose
    * names don't all match are realigned positionally — the INSERT
    * contract; named DataFrame writes pass through untouched. */
  private def align(data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val want = tableSchema.fieldNames
    if (want.isEmpty || data.columns.sameElements(want) ||
      data.columns.length != want.length ||
      data.columns.forall(want.contains)) data
    else data.toDF(scala.collection.immutable.ArraySeq.unsafeWrapArray(want): _*)
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
        (rows: org.apache.spark.sql.DataFrame, overwriteFlag: Boolean) => {
          val data = align(rows)
          val engine = new graft.core.GraftEngine(data.sparkSession, root)
          val opts = info.options
          if (overwrite || overwriteFlag) {
            val nb = opts.getInt("numBuckets", 16)
            engine.push(store, data, numBuckets = nb)
            ()
          } else {
            val ts = opts.getLong("tsMs", System.currentTimeMillis())
            if (engine.isActiveActive(store)) engine.putAA(store, data, ts)
            else engine.put(store, data, ts)
          }
        }
    }
}

object GraftTable {
  def schemaOf(spark: SparkSession, root: String, store: String): StructType = {
    val engine = new graft.core.GraftEngine(spark, root)
    // pre-first-push the store has no serving schema yet — the table is
    // write-only (ACCEPT_ANY_SCHEMA; the first overwrite push defines it);
    // reads still fail in the rewrite with the engine's own message
    if (engine.currentVersion(store) == 0) new StructType()
    else engine.servingView(store).schema
  }

  def apply(spark: SparkSession, root: String, store: String): GraftTable =
    GraftTable(root, store, schemaOf(spark, root, store))
}

/** The store's CHANGE stream as a DSv2 table — the vanilla-Spark face of
  * the changelog consumer (reference semantics, not code:
  * VeniceChangelogConsumer.java's subscribe/seekToTimestamp surface).
  * Selected with `.option("changelog", "true")`:
  *
  *  - `spark.read` → every change event since `sinceTs` (default 0):
  *    key + value columns + event ts + tombstone flag. A/A stores emit
  *    conflict-RESOLVED after-images, exactly like `GraftEngine.changelog`.
  *  - `spark.readStream` → a Structured Streaming subscription to the
  *    same events (micro-batched as the upsert log grows; checkpointing
  *    is the file source's offset log, so a restarted query resumes where
  *    it left off — the consumer-group story for free).
  *
  * Both are analysis-time rewrites ([[GraftExtensions]]) onto ordinary
  * Catalyst plans, so there is no row-level reader: the batch side is the
  * engine's changelog plan, the stream side is the parquet file source
  * over the store's log directory. */
final case class GraftChangelogTable(root: String, store: String,
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"graft-changelog:$root/$store"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      "graft changelog tables are served through an analysis-time rewrite; " +
        "add spark.sql.extensions=graft.sources.GraftExtensions to the " +
        "session config (GraftSession.build does this automatically)")
}

object GraftChangelogTable {
  def schemaOf(spark: SparkSession, root: String, store: String): StructType =
    new graft.core.GraftEngine(spark, root).changelog(store, 0L).schema
}

/** `spark.read.format("graft")` entry point (registered via the
  * DataSourceRegister service file, short name `graft`).
  *
  * Also the `writeStream.format("graft")` entry point: [[GraftTable]]
  * deliberately does NOT declare STREAMING_WRITE (a row-level streaming
  * DataWriter cannot express the engine's whole-DataFrame log appends), so
  * Spark falls back to this V1 [[StreamSinkProvider]] seam, whose
  * `addBatch` receives each microbatch as a complete DataFrame — the same
  * sanctioned fallback the batch write rides (V1_BATCH_WRITE). */
class GraftTableProvider extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft"

  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    // parameters arrive case-insensitive (DataSource.caseInsensitiveOptions)
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException(
        "writeStream.format(\"graft\") needs .option(\"root\", <storeRoot>)"))
    val store = parameters.getOrElse("store",
      throw new IllegalArgumentException(
        "writeStream.format(\"graft\") needs .option(\"store\", <storeName>)"))
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graft streaming sink appends each microbatch to the store's upsert " +
        "log (nearline puts); Complete mode would re-write the whole " +
        "result every trigger — use append or update mode")
    GraftStreamSink(root, store, parameters.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v })
  }

  private def rootStore(options: CaseInsensitiveStringMap): (String, String) = {
    val root = options.get("root")
    val store = options.get("store")
    require(root != null && store != null,
      "format(\"graft\") needs .option(\"root\", <storeRoot>) and " +
        ".option(\"store\", <storeName>)")
    (root, store)
  }

  private def isChangelog(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("changelog", false)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (root, store) = rootStore(options)
    if (isChangelog(options))
      GraftChangelogTable.schemaOf(SparkSession.active, root, store)
    else GraftTable.schemaOf(SparkSession.active, root, store)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (root, store) = rootStore(opts)
    if (isChangelog(opts)) GraftChangelogTable(root, store, schema)
    else GraftTable(root, store, schema)
  }
}

/** TableCatalog over a store root: every store directory is a table in the
  * catalog's flat namespace. Read-only — pushes go through the engine's
  * push/put/delete lifecycle, exactly as Venice routes writes through the
  * push job and the RT topic rather than SQL DML. */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null,
      s"catalog $name needs spark.sql.catalog.$name.root=<storeRoot>")
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && new java.io.File(f, "KEYS").exists())
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val store = ident.name()
    if (!new java.io.File(new java.io.File(root, store), "KEYS").exists())
      throw new NoSuchTableException(ident)
    GraftTable(SparkSession.active, root, store)
  }

  /** `SELECT … FROM cat.store TIMESTAMP AS OF t` — Spark hands the
    * instant in epoch MICROseconds; the engine's as-of read is millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadTable(ident).asInstanceOf[GraftTable]
      .copy(asOfTs = Some(timestampMicros / 1000L))

  /** `SELECT … FROM cat.store VERSION AS OF n` — the rollback-preview
    * read: version n's immutable snapshot with the live RT log overlaid,
    * i.e. the serving view as if n were current (Venice's backup-version
    * semantics, the state `rollback` would serve). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft store versions are integers (push counters); got '$version'")
    }
    loadTable(ident).asInstanceOf[GraftTable].copy(pinVersion = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft stores are created through GraftEngine.createStore + push")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft stores evolve through GraftEngine.registerValueSchema")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft stores are retired through GraftEngine lifecycle admin")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft stores cannot be renamed")
}
