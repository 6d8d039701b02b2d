package graft.ingestion

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

import graft.SparkTestBase
import graft.storage.{AuditTableInfo, Storage}

/** REAL JDBC round-trip: `extractToStorageFromRDBM` end to end against an
  * embedded Apache Derby database (on every Spark classpath — it backs the
  * Hive metastore), so `spark.read.jdbc` actually executes and the delta
  * watermark semantics run under a real dialect's type rules rather than a
  * regex fake. The reference covers this with Docker Postgres/SQL Server
  * integration tests (PostgresExtractorIntegrationTest.scala); zero-egress
  * here, Derby is the in-process stand-in.
  *
  * Derby dialect notes (each is a REAL dialect behaviour the fake never
  * exercised): `SELECT *, expr` is illegal — the select needs a table
  * alias; TIMESTAMP comparisons reject character literals — the watermark
  * must be wrapped in TIMESTAMP('...'); ROW_NUMBER() supports only an empty
  * OVER() — the split-point sampler uses a correlated count instead; `%` is
  * spelled MOD(). */
class DerbyExtractor(val spark: SparkSession, dbUrl: String) extends RDBMExtractor {

  val connectionDetails: JDBCConnection = JDBCConnection(dbUrl,
    driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  val issuedQueries = scala.collection.mutable.ArrayBuffer[String]()

  /** Derby needs a table alias to project past `*`, and a typed TIMESTAMP
    * literal for the watermark pushdown. */
  override def selectQuery(dbSchema: String, tableName: String,
      lastUpdatedColumn: Option[String], lastUpdated: Option[Timestamp]): String = {
    val base = s"select t.*, $sourceDBSystemTimestampFunction as $systemTimestampColumn " +
      s"from ${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)} t"
    (lastUpdatedColumn, lastUpdated) match {
      case (Some(c), Some(w)) => s"$base where t.${escapeKeyword(c)} > TIMESTAMP('$w')"
      case _ => base
    }
  }

  /** Same sampling contract as the trait (every maxRows-th key in key
    * order), expressed without ordered window functions: rank by correlated
    * count — fine for a sampling query over the PK index. */
  override def splitPointQuery(dbSchema: String, tableName: String,
      pks: Seq[String], maxRowsPerPartition: Int): String = {
    require(pks.size == 1, "Derby smoke covers single-column PKs")
    val tbl = s"${escapeKeyword(dbSchema)}.${escapeKeyword(tableName)}"
    val pk = escapeKeyword(pks.head)
    s"select split_point from (" +
      s"select t1.$pk as split_point, " +
      s"(select count(*) from $tbl t2 where t2.$pk <= t1.$pk) as rn " +
      s"from $tbl t1) sub " +
      s"where MOD(rn, $maxRowsPerPartition) = 0 order by split_point"
  }

  override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
    issuedQueries += query
    super.loadQuery(query, predicates) // the REAL spark.read.jdbc
  }

  def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo =
    AuditTableInfo(tableName,
      primaryKeys.getOrElse(throw new IllegalArgumentException(
        "Derby smoke extractor needs explicit primary keys")),
      Map("schema" -> dbSchema) ++ lastUpdatedColumn.map("lastUpdated" -> _),
      forceRetainStorageHistory.getOrElse(lastUpdatedColumn.isDefined))
}

/** The temporal extract loop against LIVE JDBC: an emulated system-versioned
  * table (all versions in one physical table with SYS_START/SYS_END period
  * columns — what SQL Server keeps across current+history under the hood),
  * so the production sentinel-detection query, delete-flag CASE and
  * changed-since window filters all EXECUTE under a real dialect's type
  * rules instead of a recording fake (the reference covers this with a
  * Docker SQL Server in SQLServerTemporalExtractorIntegrationTest.scala).
  * `FOR SYSTEM_TIME` has no Derby spelling; because the emulated table
  * already holds the full version history, the where-filters alone select
  * the same rows the production clause would. */
class DerbyTemporalExtractor(spark: SparkSession, dbUrl: String)
  extends SQLServerTemporalExtractor(spark,
    JDBCConnection(dbUrl, driver = Some("org.apache.derby.jdbc.EmbeddedDriver")),
    startCol = "SYS_START", endCol = "SYS_END") {

  private val start = "SYS_START"
  private val end = "SYS_END"
  val issuedQueries = scala.collection.mutable.ArrayBuffer[String]()

  override def escapeKeyword(id: String): String = id // no [brackets] on Derby

  override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
    issuedQueries += query
    super.loadQuery(query, predicates) // the REAL spark.read.jdbc
  }

  /** Production sentinel detection, Derby-typed: no datetime2(7)/nvarchar,
    * plain varchar cast of max(SYS_END). Same trust rule: only a detected
    * 9999-12-31 value is believed. */
  override def upperTimestamp(dbSchema: String, tableName: String): String = {
    val detected = loadQuery(
      s"select coalesce(cast(max($end) as varchar(29)), " +
        s"'$defaultUpperTimestamp') as database_upper_timestamp " +
        s"from $dbSchema.$tableName",
      Seq.empty).collect().head.get(0).toString
    if (detected.startsWith("9999-12-31")) detected else defaultUpperTimestamp
  }

  /** Same logical query as the SQL Server version — detected-sentinel
    * delete flag, closed-in-window OR opened-in-window delta — in Derby
    * syntax (table alias to project past *, TIMESTAMP() typed literals). */
  override def selectQuery(dbSchema: String, tableName: String,
      lastUpdatedColumn: Option[String], lastUpdated: Option[Timestamp]): String = {
    val highEnd = upperTimestamp(dbSchema, tableName)
    val base =
      s"select t.*, case when t.$end = TIMESTAMP('$highEnd') then 0 else 1 end as source_type, " +
        s"$sourceDBSystemTimestampFunction as $systemTimestampColumn " +
        s"from $dbSchema.$tableName t"
    lastUpdated match {
      case Some(ts) =>
        s"$base where (t.$end < TIMESTAMP('$highEnd') and t.$end >= TIMESTAMP('$ts')) " +
          s"or t.$start >= TIMESTAMP('$ts')"
      case None => base
    }
  }
}

class DerbyRoundTripSpec extends SparkTestBase with Matchers {

  import graft.dataflow.spark.Graft
  import graft.ingestion.IngestionActions._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def exec(sqls: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try sqls.foreach(st.executeUpdate) finally st.close()
    } finally c.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec(
      """create table APP.PEOPLE (
        |  ID bigint not null primary key,
        |  NAME varchar(64),
        |  LAST_UPDATED timestamp not null)""".stripMargin,
      "insert into APP.PEOPLE values (1, 'ada', timestamp('2024-01-01 10:00:00'))",
      "insert into APP.PEOPLE values (2, 'grace', timestamp('2024-01-05 10:00:00'))",
      "insert into APP.PEOPLE values (3, 'edsger', timestamp('2024-02-01 10:00:00'))",
      """create table APP.CODES (
        |  CODE varchar(8) not null primary key,
        |  LABEL varchar(32))""".stripMargin,
      "insert into APP.CODES values ('a1', 'alpha')",
      "insert into APP.CODES values ('b2', 'beta')",
      "insert into APP.CODES values ('c3', 'gamma')",
      "insert into APP.CODES values ('d4', 'delta')",
      "insert into APP.CODES values ('e5', 'epsilon')")
  }

  describe("embedded-Derby JDBC round trip") {

    it("extracts full then delta through the storage layer under the real dialect") {
      val base = s"$tmpDir/derby_flow"
      val cfgs = Map("PEOPLE" ->
        ExtractionTableConfig("PEOPLE", Some(Seq("ID")), Some("LAST_UPDATED")))

      // run 1: no audit table -> full load over real JDBC
      val ex1 = new DerbyExtractor(spark, url)
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex1, "APP", base, cfgs,
          ts("2024-02-02 00:00:00"))("PEOPLE"))
      ex1.issuedQueries.exists(_.contains("TIMESTAMP(")) shouldBe false

      val snap1 = Storage.openTable(spark, base, "PEOPLE").get
        .snapshot(ts("2024-06-01 00:00:00")).get
      snap1.count() shouldBe 3
      snap1.select("ID", "NAME").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted shouldBe
        Array((1L, "ada"), (2L, "grace"), (3L, "edsger"))

      // source moves on: one new row, one update to an existing PK
      exec(
        "insert into APP.PEOPLE values (4, 'alan', timestamp('2024-03-01 10:00:00'))",
        "update APP.PEOPLE set NAME = 'grace hopper', " +
          "LAST_UPDATED = timestamp('2024-03-02 10:00:00') where ID = 2")

      // run 2: the pushed query carries the stored watermark as a typed
      // TIMESTAMP literal and only the 2 changed rows come back
      val ex2 = new DerbyExtractor(spark, url)
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex2, "APP", base, cfgs,
          ts("2024-03-03 00:00:00"))("PEOPLE"))
      ex2.issuedQueries.exists(
        _.contains("> TIMESTAMP('2024-02-01 10:00:00")) shouldBe true

      val table = Storage.openTable(spark, base, "PEOPLE").get
      table.regions.size shouldBe 2 // full region + delta region
      val snap2 = table.snapshot(ts("2024-06-01 00:00:00")).get
      snap2.count() shouldBe 4 // PK-window dedup keeps the newest version
      snap2.where(org.apache.spark.sql.functions.col("ID") === 2L)
        .select("NAME").collect().head.getString(0) shouldBe "grace hopper"
    }

    it("runs the full temporal version/delete loop over live JDBC") {
      exec(
        """create table APP.USERS_HIST (
          |  ID bigint not null,
          |  NAME varchar(64),
          |  SYS_START timestamp not null,
          |  SYS_END timestamp not null)""".stripMargin,
        "insert into APP.USERS_HIST values (1, 'ada', " +
          "timestamp('2024-01-01 10:00:00'), timestamp('9999-12-31 23:59:59'))",
        "insert into APP.USERS_HIST values (2, 'grace', " +
          "timestamp('2024-01-01 10:00:00'), timestamp('9999-12-31 23:59:59'))")
      val base = s"$tmpDir/derby_temporal"
      val cfgs = Map("USERS_HIST" ->
        ExtractionTableConfig("USERS_HIST", Some(Seq("ID")), Some("SYS_START")))
      def snapshotAt(at: Timestamp): Array[(Long, String)] = {
        val (_, done) = Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
          .snapshotTemporalTablesFromStorage(base, at)("USERS_HIST"))
        done.inputs.get[org.apache.spark.sql.Dataset[_]]("USERS_HIST").toDF()
          .select("ID", "NAME").collect()
          .map(r => (r.getLong(0), r.getString(1))).sorted
      }

      // run 1: full version-history load; the sentinel-detection query and
      // the CASE delete flag execute on the live dialect
      val ex1 = new DerbyTemporalExtractor(spark, url)
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex1, "APP", base, cfgs,
          ts("2024-02-01 00:00:00"))("USERS_HIST"))
      ex1.issuedQueries.exists(_.contains("database_upper_timestamp")) shouldBe true
      ex1.issuedQueries.exists(_.contains("as source_type")) shouldBe true
      snapshotAt(ts("2024-02-01 00:00:00")) shouldBe
        Array((1L, "ada"), (2L, "grace"))

      // source history moves on: UPDATE id 1 (close v1, open v2) and
      // DELETE id 2 (close its version, nothing opens)
      exec(
        "update APP.USERS_HIST set SYS_END = timestamp('2024-03-01 00:00:00') " +
          "where ID = 1 and NAME = 'ada'",
        "insert into APP.USERS_HIST values (1, 'ada lovelace', " +
          "timestamp('2024-03-01 00:00:00'), timestamp('9999-12-31 23:59:59'))",
        "update APP.USERS_HIST set SYS_END = timestamp('2024-03-05 00:00:00') " +
          "where ID = 2")

      // run 2: the delta carries the stored watermark through the
      // closed-in-window OR opened-in-window filters, with typed literals
      val ex2 = new DerbyTemporalExtractor(spark, url)
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex2, "APP", base, cfgs,
          ts("2024-03-06 00:00:00"))("USERS_HIST"))
      val delta = ex2.issuedQueries.filter(_.contains("as source_type"))
      delta.exists(q => q.contains("SYS_START >= TIMESTAMP('2024-01-01 10:00:00") &&
        q.contains("SYS_END >= TIMESTAMP('2024-01-01 10:00:00")) shouldBe true

      // version resolution + delete detection from the stored history:
      // at 03-10 the update shows and the deleted PK is GONE
      snapshotAt(ts("2024-03-10 00:00:00")) shouldBe
        Array((1L, "ada lovelace"))
      // time travel to 02-15: both original versions still valid (the
      // closed copies beat the stale open ones via the end-asc tie-break)
      snapshotAt(ts("2024-02-15 00:00:00")) shouldBe
        Array((1L, "ada"), (2L, "grace"))
    }

    it("shards the read with real split predicates pushed to Derby") {
      val ex = new DerbyExtractor(spark, url)
      val cfg = ExtractionTableConfig("CODES", Some(Seq("CODE")),
        lastUpdatedColumn = None, maxRowsPerPartition = Some(2))
      val df = ex.getTableDataset("APP", cfg, None)
      // 5 rows % 2 -> split points at ranks 2 and 4 -> 3 range predicates,
      // which become 3 JDBC partitions; rows still exactly once
      df.rdd.getNumPartitions shouldBe 3
      df.select("CODE").collect().map(_.getString(0)).sorted shouldBe
        Array("a1", "b2", "c3", "d4", "e5")
      // audit column attached from the DB-side system timestamp
      df.columns should contain(ex.rdbmRecordLastUpdated)
    }
  }
}
