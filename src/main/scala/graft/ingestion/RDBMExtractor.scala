package graft.ingestion

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.util.Properties

import graft.storage.AuditTableInfo

/** Per-table extraction config (reference RDBMIngestionUtils.scala:109-113). */
final case class ExtractionTableConfig(
    tableName: String,
    primaryKeys: Option[Seq[String]] = None,
    lastUpdatedColumn: Option[String] = None,
    maxRowsPerPartition: Option[Int] = None,
    forceFullLoad: Boolean = false,
    /** Override the retain-history default (retain iff a lastUpdated column
      * exists — incremental deltas carry real version history worth keeping;
      * a column-less table re-extracts in full each run, and retaining every
      * identical snapshot would grow storage unboundedly; see reference
      * RDBMExtractor.scala:97). */
    forceRetainStorageHistory: Option[Boolean] = None)

/** Incremental JDBC extraction into the storage layer.
  *
  * The contract mirrors the reference (RDBMExtractor.scala:17-288): build a
  * delta select (`lastUpdated > ?`), attach the extraction timestamp, and
  * parallelise big tables with predicate splits derived from a row_number
  * sampling query pushed to the database. SQL generation is separated from
  * execution so dialects and tests override the I/O boundary only.
  */
trait RDBMExtractor {

  def spark: SparkSession
  def connectionDetails: JDBCConnection
  def sourceDBSystemTimestampFunction: String = "CURRENT_TIMESTAMP"
  /** Column added to every extracted row with the source row's last-update. */
  val rdbmRecordLastUpdated = "rdbm_record_last_updated"
  val systemTimestampColumn = "system_timestamp_of_extraction"

  /** Table metadata (PKs discovered from the DB or provided). */
  def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo

  /** Dialect-specific quoting. */
  def escapeKeyword(identifier: String): String = identifier

  /** Names pushed INSIDE a SQL string literal (catalog probes like
    * `object_id('schema.table')`) get embedded quotes doubled — the same
    * injection discipline `escapeKeyword` applies to identifier position.
    *
    * CASE SENSITIVITY (round-13, ADVICE): routing catalog probes through
    * quote_ident/quotename (round 12) also changed name RESOLUTION — a
    * quoted identifier never case-folds, so configured schema/table names
    * must now match the catalog's stored case exactly ('Public' no longer
    * finds postgres's folded 'public'). That is deliberate: it is the same
    * resolution rule `escapeKeyword` already gives every identifier-
    * position name in the generated selects, so quoting is consistent
    * end-to-end instead of differing between the probe and the select. */
  protected def escapeStringLiteral(s: String): String = s.replace("'", "''")

  /** The delta select pushed to the DB. */
  def selectQuery(dbSchema: String, tableName: String,
      lastUpdatedColumn: Option[String], lastUpdated: Option[Timestamp]): String = {
    val base = s"select *, $sourceDBSystemTimestampFunction as $systemTimestampColumn " +
      s"from ${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)}"
    (lastUpdatedColumn, lastUpdated) match {
      case (Some(col), Some(ts)) => s"$base where ${escapeKeyword(col)} > '$ts'"
      case _ => base
    }
  }

  /** Predicates that shard the delta read into ~`maxRowsPerPartition`-row
    * chunks: `pk >= lo and pk < hi` ranges from a pushed row_number sampling
    * query (composite PKs concatenate). Reference RDBMExtractor.scala:241-288. */
  def splitPointQuery(dbSchema: String, tableName: String, pks: Seq[String],
      maxRowsPerPartition: Int): String = {
    val pkExpr =
      if (pks.size == 1) escapeKeyword(pks.head)
      else s"concat(${pks.map(escapeKeyword).mkString(", '_', ")})"
    s"select split_point from (" +
      s"select $pkExpr as split_point, row_number() over (order by $pkExpr) as rn " +
      s"from ${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)}) sub " +
      s"where rn % $maxRowsPerPartition = 0 order by split_point"
  }

  def splitPredicates(pks: Seq[String], splitPoints: Seq[String]): Seq[String] = {
    val pkExpr =
      if (pks.size == 1) escapeKeyword(pks.head)
      else s"concat(${pks.map(escapeKeyword).mkString(", '_', ")})"
    if (splitPoints.isEmpty) Seq.empty
    else {
      val bounds = None +: splitPoints.map(Some(_)) :+ None
      bounds.sliding(2).collect {
        case Seq(None, Some(hi)) => s"$pkExpr < '$hi'"
        case Seq(Some(lo), Some(hi)) => s"$pkExpr >= '$lo' and $pkExpr < '$hi'"
        case Seq(Some(lo), None) => s"$pkExpr >= '$lo'"
      }.toSeq
    }
  }

  /** I/O boundary: run a pushed query. Overridden by test doubles. */
  protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
    val props = new Properties()
    connectionDetails.driver.foreach(props.setProperty("driver", _))
    connectionDetails.user.foreach(props.setProperty("user", _))
    connectionDetails.password.foreach(props.setProperty("password", _))
    val wrapped = s"($query) s"
    if (predicates.isEmpty) spark.read.jdbc(connectionDetails.url, wrapped, props)
    else spark.read.jdbc(connectionDetails.url, wrapped, predicates.toArray, props)
  }

  /** Run the split-point query (single small result). */
  protected def loadSplitPoints(query: String): Seq[String] =
    loadQuery(query, Seq.empty).collect().map(_.get(0).toString).toSeq

  /** Dialect hook: adjust the incremental watermark before it is pushed
    * (SQL Server clamps below its 1900-01-01 datetime floor). */
  protected def adjustLastUpdated(ts: Timestamp): Timestamp = ts

  /** Extract a table's delta as a DataFrame with audit columns attached. */
  def getTableDataset(dbSchema: String, cfg: ExtractionTableConfig,
      lastUpdated: Option[Timestamp]): DataFrame = {
    val effectiveLast =
      if (cfg.forceFullLoad) None else lastUpdated.map(adjustLastUpdated)
    val query = selectQuery(dbSchema, cfg.tableName, cfg.lastUpdatedColumn, effectiveLast)
    val predicates = (cfg.primaryKeys, cfg.maxRowsPerPartition) match {
      case (Some(pks), Some(maxRows)) if pks.nonEmpty =>
        splitPredicates(pks,
          loadSplitPoints(splitPointQuery(dbSchema, cfg.tableName, pks, maxRows)))
      case _ => Seq.empty
    }
    val df = loadQuery(query, predicates)
    cfg.lastUpdatedColumn match {
      case Some(c) => df.withColumn(rdbmRecordLastUpdated, col(c).cast("timestamp"))
      case None => df.withColumn(rdbmRecordLastUpdated, col(systemTimestampColumn))
    }
  }
}

final case class JDBCConnection(
    url: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None)

/** Postgres dialect: PKs from pg_index/pg_attribute.
  * Reference: PostgresExtractor.scala:32-66. */
class PostgresExtractor(val spark: SparkSession, val connectionDetails: JDBCConnection)
  extends RDBMExtractor {

  override def escapeKeyword(id: String): String = s""""$id""""

  def primaryKeyQuery(dbSchema: String, tableName: String): String =
    s"""select a.attname as pk_column
       |from pg_index i
       |join pg_attribute a on a.attrelid = i.indrelid and a.attnum = any(i.indkey)
       |where i.indrelid = (quote_ident('${escapeStringLiteral(dbSchema)}') || '.' || quote_ident('${escapeStringLiteral(tableName)}'))::regclass and i.indisprimary
       |order by array_position(i.indkey, a.attnum)""".stripMargin
       // ordered by key ordinal: without it composite-PK column order is
       // unspecified and varies across runs, breaking .table_info equality

  def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo = {
    val pks = primaryKeys.getOrElse(
      loadQuery(primaryKeyQuery(dbSchema, tableName), Seq.empty)
        .collect().map(_.getString(0)).toSeq)
    if (pks.isEmpty)
      throw new IllegalArgumentException(
        s"No primary keys found for $dbSchema.$tableName; provide them explicitly")
    AuditTableInfo(tableName, pks,
      Map("schema" -> dbSchema) ++ lastUpdatedColumn.map("lastUpdated" -> _),
      forceRetainStorageHistory.getOrElse(lastUpdatedColumn.isDefined))
  }
}

/** SQL Server dialect: PKs via sys.indexes; brackets quoting; guards the
  * 1900-01-01 datetime floor (SQLServerBaseExtractor.scala:39-59). */
class SQLServerExtractor(val spark: SparkSession, val connectionDetails: JDBCConnection)
  extends RDBMExtractor {

  override def escapeKeyword(id: String): String = s"[$id]"

  val sqlServerDatetimeMin: Timestamp = Timestamp.valueOf("1900-01-01 00:00:00")

  def clampLastUpdated(ts: Timestamp): Timestamp =
    if (ts.before(sqlServerDatetimeMin)) sqlServerDatetimeMin else ts

  override protected def adjustLastUpdated(ts: Timestamp): Timestamp = clampLastUpdated(ts)

  def primaryKeyQuery(dbSchema: String, tableName: String): String =
    s"""select c.name as pk_column
       |from sys.indexes i
       |join sys.index_columns ic on i.object_id = ic.object_id and i.index_id = ic.index_id
       |join sys.columns c on ic.object_id = c.object_id and ic.column_id = c.column_id
       |where i.is_primary_key = 1 and i.object_id = object_id(quotename('${escapeStringLiteral(dbSchema)}') + '.' + quotename('${escapeStringLiteral(tableName)}'))
       |order by ic.key_ordinal""".stripMargin

  def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo = {
    val pks = primaryKeys.getOrElse(
      loadQuery(primaryKeyQuery(dbSchema, tableName), Seq.empty)
        .collect().map(_.getString(0)).toSeq)
    if (pks.isEmpty)
      throw new IllegalArgumentException(
        s"No primary keys found for $dbSchema.$tableName; provide them explicitly")
    AuditTableInfo(tableName, pks,
      Map("schema" -> dbSchema) ++ lastUpdatedColumn.map("lastUpdated" -> _),
      forceRetainStorageHistory.getOrElse(lastUpdatedColumn.isDefined))
  }
}

/** Temporal (system-versioned) SQL Server tables: ONE query over
  * `FOR SYSTEM_TIME` (which already unifies current and history versions —
  * a separate history-table select would return closed versions twice),
  * with delete detection via the validity end column: `source_type` 0 =
  * live version (end = upper bound), 1 = historical/deleted version.
  * Changed-since filter: versions closed in the window OR opened in it.
  * Reference: SQLServerTemporalExtractor.scala:163-205. */
class SQLServerTemporalExtractor(spark: SparkSession, connectionDetails: JDBCConnection,
    startCol: String = "sys_start", endCol: String = "sys_end",
    discoverPeriods: Boolean = false)
  extends SQLServerExtractor(spark, connectionDetails) {

  /** Catalog discovery of a system-versioned table's period columns and
    * history table (sys.periods → period column ids, sys.tables →
    * history_table_id), so a caller migrating a whole schema need not know
    * each table's validity column names. Reference discovers the same
    * catalog relations in one all-tables sweep
    * (SQLServerTemporalExtractor.scala:42-74); this asks per table — the
    * flow extracts a configured table list, and a per-table `object_id()`
    * probe keeps the pushed result a single row instead of a catalog scan. */
  def temporalMetadataQuery(dbSchema: String, tableName: String): String =
    s"""select schema_name(t.schema_id) as schema_name, t.name as table_name,
       |  schema_name(h.schema_id) as history_schema, h.name as history_table,
       |  cs.name as start_col, ce.name as end_col
       |from sys.tables t
       |left join sys.tables h on t.history_table_id = h.object_id
       |join sys.periods p on p.object_id = t.object_id
       |join sys.columns cs on cs.object_id = t.object_id and cs.column_id = p.start_column_id
       |join sys.columns ce on ce.object_id = t.object_id and ce.column_id = p.end_column_id
       |where t.object_id = object_id(quotename('${escapeStringLiteral(dbSchema)}') + '.' + quotename('${escapeStringLiteral(tableName)}'))""".stripMargin

  /** (startCol, endCol, historyTable) from the catalog; None when the table
    * carries no sys.periods row (not system-versioned). */
  def discoverTemporalColumns(dbSchema: String, tableName: String)
      : Option[(String, String, Option[String])] = {
    val rows = loadQuery(temporalMetadataQuery(dbSchema, tableName), Seq.empty)
      .collect()
    rows.headOption.map { r =>
      def s(n: String) = r.get(r.fieldIndex(n))
      (s("start_col").toString, s("end_col").toString,
        Option(s("history_table")).map(_.toString))
    }
  }

  /** Per-table period columns: the catalog's when `discoverPeriods`, the
    * constructor's otherwise. Discovery results cache per table — the
    * metadata query must not re-push for every generated select. */
  private val periodCache =
    scala.collection.mutable.Map[(String, String), (String, String)]()
  protected def periodColumns(dbSchema: String, tableName: String): (String, String) =
    if (!discoverPeriods) (startCol, endCol)
    else periodCache.getOrElseUpdate((dbSchema, tableName),
      discoverTemporalColumns(dbSchema, tableName)
        .map { case (s, e, _) => (s, e) }
        .getOrElse(throw new IllegalArgumentException(
          s"$dbSchema.$tableName carries no sys.periods row — not a " +
            "system-versioned table; use SQLServerExtractor or pass " +
            "startCol/endCol explicitly")))

  /** Temporal tables mark their metadata so the flow-level snapshot action
    * ([[graft.ingestion.IngestionActions]]) resolves versions + deletes via
    * [[TemporalSnapshot]] instead of the plain PK-window snapshot; history
    * retention is forced — delete detection needs the closed versions
    * (reference SQLServerTemporalExtractor.scala:40-60). */
  override def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo = {
    val base = super.getTableMetadata(dbSchema, tableName, primaryKeys,
      lastUpdatedColumn, forceRetainStorageHistory)
    val (sCol, eCol) = periodColumns(dbSchema, tableName)
    base.copy(
      meta = base.meta ++ Map(
        "temporal" -> "true", "startCol" -> sCol, "endCol" -> eCol),
      retainHistory = true)
  }

  /** Fallback sentinel when the detection query returns null (empty table). */
  val defaultUpperTimestamp = "9999-12-31 23:59:59"
  val lowEnd = "1900-01-01 00:00:00"
  /** FOR SYSTEM_TIME accepts a plain date upper bound; only the row filters
    * need the exact sentinel (reference SQLServerTemporalExtractor.scala:76-77). */
  val upperDateBound = "9999-12-31"

  protected def castToDateTime7(c: String): String =
    s"cast(${escapeKeyword(c)} as datetime2(7))"

  /** SQL Server writes live-row validity ends as 9999-12-31 23:59:59.0000000
    * on some versions and ...23:59:59.9999999 on others, so an exact literal
    * misclassifies every live row as deleted. Detect the sentinel per table
    * from max(endCol) at datetime2(7) precision, as the reference does
    * (SQLServerTemporalExtractor.scala:82-112). The detected value is only
    * trusted when it IS a 9999-12-31 sentinel: in a table whose rows were all
    * deleted, max(endCol) is the latest deletion time, and using it would
    * flag that closed version as live and hide it from the delta's
    * closed-in-window branch. */
  def upperTimestamp(dbSchema: String, tableName: String): String = {
    val (_, eCol) = periodColumns(dbSchema, tableName)
    val detected = loadQuery(
      s"select coalesce(cast(max(${castToDateTime7(eCol)}) as nvarchar(27)), " +
        s"'$defaultUpperTimestamp') as database_upper_timestamp " +
        s"from ${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)}",
      Seq.empty).collect().head.get(0).toString
    if (detected.startsWith("9999-12-31")) detected else defaultUpperTimestamp
  }

  override def selectQuery(dbSchema: String, tableName: String,
      lastUpdatedColumn: Option[String], lastUpdated: Option[Timestamp]): String = {
    val (sRaw, eRaw) = periodColumns(dbSchema, tableName)
    val end = escapeKeyword(eRaw)
    val start = escapeKeyword(sRaw)
    val highEnd = upperTimestamp(dbSchema, tableName)
    val base =
      s"select *, case when $end = '$highEnd' then 0 else 1 end as source_type, " +
        s"$sourceDBSystemTimestampFunction as $systemTimestampColumn " +
        s"from ${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)}"
    lastUpdated match {
      case Some(ts) =>
        s"$base for system_time from '$ts' to '$upperDateBound' " +
          s"where ($end < '$highEnd' and $end >= '$ts') or $start >= '$ts'"
      case None =>
        // full load = the table's entire version history
        s"$base for system_time from '$lowEnd' to '$upperDateBound'"
    }
  }
}

/** Pure DataFrame temporal snapshot incl. delete handling: keep the record
  * version valid at `ts` (start <= ts < end), dropping start==end collision
  * rows. Reference: RDBMIngestionUtils.scala:66-82. */
object TemporalSnapshot {
  def apply(df: DataFrame, pks: Seq[String], startCol: String, endCol: String,
      ts: Timestamp): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(startCol).desc, col(endCol).asc)
    df.where(col(startCol) <= lit(ts) && col(startCol) =!= col(endCol))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col(endCol) > lit(ts))
      .drop("_rn")
  }
}
