package graft.ingestion

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

import graft.SparkTestBase
import graft.storage.{AuditTableInfo, Storage}

/** Test double: answers pushed queries from in-memory DataFrames, recording
  * the generated SQL (the pattern the reference uses for offline tests). */
class FakeExtractor(val spark: SparkSession,
    tables: Map[String, DataFrame]) extends RDBMExtractor {
  val connectionDetails: JDBCConnection = JDBCConnection("jdbc:fake://db")
  val issuedQueries = scala.collection.mutable.ArrayBuffer[String]()

  def getTableMetadata(dbSchema: String, tableName: String,
      primaryKeys: Option[Seq[String]], lastUpdatedColumn: Option[String],
      forceRetainStorageHistory: Option[Boolean]): AuditTableInfo =
    AuditTableInfo(tableName, primaryKeys.getOrElse(Seq("id")), Map.empty,
      forceRetainStorageHistory.getOrElse(true))

  override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
    issuedQueries += query
    val table = tables.keys.find(query.contains).getOrElse(
      throw new IllegalArgumentException(s"No fake table matches: $query"))
    import org.apache.spark.sql.functions._
    var df = tables(table).withColumn(systemTimestampColumn, current_timestamp())
    // honour the pushed delta filter "where <col> > '<ts>'"
    val Where = raw"where (\w+) > '([^']+)'".r.unanchored
    query match {
      case Where(c, ts) => df = df.where(col(c) > lit(Timestamp.valueOf(ts)))
      case _ => ()
    }
    df
  }
}

class IngestionSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  describe("SQL generation") {
    it("builds plain and delta select queries") {
      val e = new PostgresExtractor(spark, JDBCConnection("jdbc:postgresql://x"))
      e.selectQuery("public", "users", None, None) shouldBe
        """select *, CURRENT_TIMESTAMP as system_timestamp_of_extraction from "public"."users""""
      e.selectQuery("public", "users", Some("updated"), Some(ts("2024-01-01 00:00:00"))) should
        include("""where "updated" > '2024-01-01 00:00:00""")
    }

    it("builds split-point queries and range predicates") {
      val e = new SQLServerExtractor(spark, JDBCConnection("jdbc:sqlserver://x"))
      e.splitPointQuery("dbo", "users", Seq("id"), 1000) should
        include("row_number() over (order by [id])")
      e.splitPredicates(Seq("id"), Seq("100", "200")) shouldBe Seq(
        "[id] < '100'", "[id] >= '100' and [id] < '200'", "[id] >= '200'")
      e.splitPredicates(Seq("a", "b"), Seq("5_x")) shouldBe Seq(
        "concat([a], '_', [b]) < '5_x'", "concat([a], '_', [b]) >= '5_x'")
    }

    it("clamps SQL Server datetimes below the 1900 floor") {
      val e = new SQLServerExtractor(spark, JDBCConnection("jdbc:sqlserver://x"))
      e.clampLastUpdated(ts("1800-01-01 00:00:00")) shouldBe ts("1900-01-01 00:00:00")
      e.clampLastUpdated(ts("2024-01-01 00:00:00")) shouldBe ts("2024-01-01 00:00:00")
    }

    /** Temporal extractor answering the sentinel-detection query from a fixed
      * string — the real one pushes `max(cast(sys_end as datetime2(7)))`. */
    class FixedSentinelExtractor(detected: String) extends SQLServerTemporalExtractor(
        spark, JDBCConnection("jdbc:sqlserver://x")) {
      val issuedQueries = scala.collection.mutable.ArrayBuffer[String]()
      override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
        issuedQueries += query
        Seq(detected).toDF("database_upper_timestamp")
      }
    }

    it("temporal extractor reads versions once via FOR SYSTEM_TIME with delete flags") {
      // SQL Server live rows carry .9999999 (or .0000000) validity ends — the
      // sentinel must be detected per table, never hardcoded at second precision
      val e = new FixedSentinelExtractor("9999-12-31 23:59:59.9999999")
      val q = e.selectQuery("dbo", "users", None, Some(ts("2024-01-01 00:00:00")))
      e.issuedQueries.head should include(
        "coalesce(cast(max(cast([sys_end] as datetime2(7))) as nvarchar(27))")
      q should include("for system_time from '2024-01-01 00:00:00.0' to '9999-12-31'")
      // FOR SYSTEM_TIME already unifies history — a separate history select
      // would return closed versions twice
      q should not include "union all"
      // delete flag uses the DETECTED sentinel, so live rows get source_type=0
      q should include("case when [sys_end] = '9999-12-31 23:59:59.9999999' then 0 else 1 end as source_type")
      // changed-since filter: closed in window OR opened in window
      q should include("([sys_end] < '9999-12-31 23:59:59.9999999' and [sys_end] >= '2024-01-01 00:00:00.0') " +
        "or [sys_start] >= '2024-01-01 00:00:00.0'")
      // full load covers the entire version history
      val full = e.selectQuery("dbo", "users", None, None)
      full should include("for system_time from '1900-01-01 00:00:00' to '9999-12-31'")
    }

    it("pins the dialect SQL of the Docker-unreachable paths byte-exactly") {
      // These strings only ever execute against real Postgres / SQL Server
      // (the reference proves them via Docker integration tests we cannot
      // run offline: PostgresExtractorIntegrationTest.scala,
      // SQLServerTemporalExtractorIntegrationTest.scala:1-513). Golden-
      // pinning the exact bytes makes dialect drift a visible diff instead
      // of a silent production surprise.
      val pg = new PostgresExtractor(spark, JDBCConnection("jdbc:postgresql://x"))
      // pg_index PK discovery (reference PostgresExtractor.scala:32-54
      // proves pg_index/pg_attribute carry the PK; ours adds the ordinal
      // sort so composite-PK order is deterministic)
      pg.primaryKeyQuery("public", "users") shouldBe
        """select a.attname as pk_column
          |from pg_index i
          |join pg_attribute a on a.attrelid = i.indrelid and a.attnum = any(i.indkey)
          |where i.indrelid = (quote_ident('public') || '.' || quote_ident('users'))::regclass and i.indisprimary
          |order by array_position(i.indkey, a.attnum)""".stripMargin

      val ms = new SQLServerExtractor(spark, JDBCConnection("jdbc:sqlserver://x"))
      // sys.indexes PK discovery (reference SQLServerTemporalExtractor
      // .scala:60-65 joins the same three catalog relations)
      ms.primaryKeyQuery("dbo", "users") shouldBe
        """select c.name as pk_column
          |from sys.indexes i
          |join sys.index_columns ic on i.object_id = ic.object_id and i.index_id = ic.index_id
          |join sys.columns c on ic.object_id = c.object_id and ic.column_id = c.column_id
          |where i.is_primary_key = 1 and i.object_id = object_id(quotename('dbo') + '.' + quotename('users'))
          |order by ic.key_ordinal""".stripMargin

      val tmp = new SQLServerTemporalExtractor(spark, JDBCConnection("jdbc:sqlserver://x"))
      // sys.periods discovery (reference SQLServerTemporalExtractor
      // .scala:42-74 — same period/history relations, per-table probe here)
      tmp.temporalMetadataQuery("dbo", "users") shouldBe
        """select schema_name(t.schema_id) as schema_name, t.name as table_name,
          |  schema_name(h.schema_id) as history_schema, h.name as history_table,
          |  cs.name as start_col, ce.name as end_col
          |from sys.tables t
          |left join sys.tables h on t.history_table_id = h.object_id
          |join sys.periods p on p.object_id = t.object_id
          |join sys.columns cs on cs.object_id = t.object_id and cs.column_id = p.start_column_id
          |join sys.columns ce on ce.object_id = t.object_id and ce.column_id = p.end_column_id
          |where t.object_id = object_id(quotename('dbo') + '.' + quotename('users'))""".stripMargin

      // catalog probes are injection-safe: a name carrying a quote doubles
      // it inside the literal, and quotename/quote_ident bracket the result
      // server-side (dots and brackets in names can no longer split the
      // object_id argument)
      tmp.temporalMetadataQuery("dbo", "us'ers") should include(
        "object_id(quotename('dbo') + '.' + quotename('us''ers'))")
      ms.primaryKeyQuery("d'bo", "users") should include(
        "object_id(quotename('d''bo') + '.' + quotename('users'))")
      pg.primaryKeyQuery("public", "us'ers") should include(
        "(quote_ident('public') || '.' || quote_ident('us''ers'))::regclass")

      // FOR SYSTEM_TIME delta select (reference SQLServerTemporalExtractor
      // .scala:163-182: same clause order — FOR SYSTEM_TIME immediately
      // after the table name, then the closed-in-window OR opened-in-window
      // row filter with the detected sentinel)
      val fx = new FixedSentinelExtractor("9999-12-31 23:59:59.9999999")
      fx.selectQuery("dbo", "users", None, Some(ts("2024-01-01 00:00:00"))) shouldBe
        "select *, case when [sys_end] = '9999-12-31 23:59:59.9999999' then 0 else 1 end as source_type, " +
          "CURRENT_TIMESTAMP as system_timestamp_of_extraction from [dbo].[users] " +
          "for system_time from '2024-01-01 00:00:00.0' to '9999-12-31' " +
          "where ([sys_end] < '9999-12-31 23:59:59.9999999' and [sys_end] >= '2024-01-01 00:00:00.0') " +
          "or [sys_start] >= '2024-01-01 00:00:00.0'"

      // row_number split-point sampling (reference RDBMExtractor.scala:241-288)
      ms.splitPointQuery("dbo", "users", Seq("id"), 50000) shouldBe
        "select split_point from (" +
          "select [id] as split_point, row_number() over (order by [id]) as rn " +
          "from [dbo].[users]) sub where rn % 50000 = 0 order by split_point"
    }

    it("discovers period columns from sys.periods when asked, and refuses non-temporal tables") {
      // fake connection answering the catalog probe (one row: custom period
      // column names) and the sentinel detection
      class DiscoveringFake extends SQLServerTemporalExtractor(
          spark, JDBCConnection("jdbc:sqlserver://x"), discoverPeriods = true) {
        val issuedQueries = scala.collection.mutable.ArrayBuffer[String]()
        override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame = {
          issuedQueries += query
          if (query.contains("sys.periods"))
            Seq(("dbo", "users", "dbo", "users_history", "valid_from", "valid_to"))
              .toDF("schema_name", "table_name", "history_schema",
                "history_table", "start_col", "end_col")
          else Seq("9999-12-31 23:59:59.9999999").toDF("database_upper_timestamp")
        }
      }
      val e = new DiscoveringFake
      val q = e.selectQuery("dbo", "users", None, Some(ts("2024-01-01 00:00:00")))
      // the generated delta uses the DISCOVERED validity columns
      q should include("[valid_to] < '9999-12-31 23:59:59.9999999'")
      q should include("[valid_from] >= '2024-01-01 00:00:00.0'")
      q should not include "sys_end"
      // discovery is cached: the catalog probe pushed exactly once even
      // though selectQuery + upperTimestamp both need the period columns
      e.issuedQueries.count(_.contains("sys.periods")) shouldBe 1
      // table metadata records the discovered columns for the snapshot action
      val meta = e.getTableMetadata("dbo", "users", Some(Seq("id")), None, None)
      meta.meta("startCol") shouldBe "valid_from"
      meta.meta("endCol") shouldBe "valid_to"
      meta.retainHistory shouldBe true

      // a table without a sys.periods row is not system-versioned: refuse
      // loudly instead of silently generating sys_start/sys_end SQL
      class EmptyCatalogFake extends SQLServerTemporalExtractor(
          spark, JDBCConnection("jdbc:sqlserver://x"), discoverPeriods = true) {
        override protected def loadQuery(query: String, predicates: Seq[String]): DataFrame =
          Seq.empty[(String, String, String, String, String, String)]
            .toDF("schema_name", "table_name", "history_schema",
              "history_table", "start_col", "end_col")
      }
      val ex = intercept[IllegalArgumentException] {
        (new EmptyCatalogFake).selectQuery("dbo", "plain", None, None)
      }
      ex.getMessage should include("no sys.periods row")
    }

    it("temporal extractor only trusts a detected sentinel that IS 9999-12-31") {
      // all-rows-deleted table: max(sys_end) is the latest deletion time, not
      // the live-row sentinel — using it would flag that closed version as
      // live AND hide it from the delta's closed-in-window branch
      val e = new FixedSentinelExtractor("2024-06-01 10:00:00.0000000")
      val q = e.selectQuery("dbo", "users", None, Some(ts("2024-01-01 00:00:00")))
      q should include("case when [sys_end] = '9999-12-31 23:59:59' then 0 else 1 end")
      q should include("[sys_end] < '9999-12-31 23:59:59'")
    }
  }

  describe("temporal snapshot") {
    it("keeps the version valid at ts and detects deletes") {
      val df = Seq(
        // id, value, start, end
        (1L, "v1", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
        (1L, "v2", ts("2024-02-01 00:00:00"), ts("9999-12-31 23:59:59")),
        (2L, "gone", ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")),
        (3L, "same", ts("2024-01-05 00:00:00"), ts("2024-01-05 00:00:00")) // collision row
      ).toDF("id", "value", "sys_start", "sys_end")

      val at = TemporalSnapshot(df, Seq("id"), "sys_start", "sys_end", ts("2024-04-01 00:00:00"))
        .select("id", "value").as[(Long, String)].collect().sortBy(_._1)
      at shouldBe Array((1L, "v2")) // id2 deleted by then, id3 collision dropped

      val mid = TemporalSnapshot(df, Seq("id"), "sys_start", "sys_end", ts("2024-01-15 00:00:00"))
        .select("id", "value").as[(Long, String)].collect().sortBy(_._1)
      mid shouldBe Array((1L, "v1"), (2L, "gone"))
    }
  }

  describe("flow-level ingestion actions") {
    import graft.dataflow.spark.Graft
    import graft.ingestion.IngestionActions._

    it("extractToStorageFromRDBM runs the full loop: create, extract, append, then delta") {
      val base = s"$tmpDir/rdbm_flow"
      val src = Seq(
        (1L, "a", ts("2024-01-01 10:00:00")),
        (2L, "b", ts("2024-01-05 10:00:00")),
        (3L, "c", ts("2024-02-01 10:00:00"))
      ).toDF("id", "v", "updated")
      val cfgs = Map("src_table" ->
        ExtractionTableConfig("src_table", Some(Seq("id")), Some("updated")))

      // run 1: table does not exist yet -> full load
      val ex1 = new FakeExtractor(spark, Map("src_table" -> src))
      val flow1 = Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex1, "public", base, cfgs,
          ts("2024-02-02 00:00:00"))("src_table")
      Graft.sparkExecutor(4).execute(flow1)
      ex1.issuedQueries.exists(_.contains("where updated >")) shouldBe false

      Storage.openTable(spark, base, "src_table").get
        .snapshot(ts("2024-06-01 00:00:00")).get.count() shouldBe 3

      // run 2: new source row -> only the delta beyond the stored watermark
      val src2 = src.union(Seq((4L, "d", ts("2024-03-01 10:00:00"))).toDF("id", "v", "updated"))
      val ex2 = new FakeExtractor(spark, Map("src_table" -> src2))
      val flow2 = Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex2, "public", base, cfgs,
          ts("2024-03-02 00:00:00"))("src_table")
      Graft.sparkExecutor(4).execute(flow2)
      ex2.issuedQueries.exists(_.contains("where updated > '2024-02-01 10:00:00")) shouldBe true

      val t = Storage.openTable(spark, base, "src_table").get
      t.snapshot(ts("2024-06-01 00:00:00")).get.count() shouldBe 4
      t.regions.size shouldBe 2 // full region + delta region
    }

    it("applies the lastUpdatedOffset safety margin to the pushed watermark") {
      val base = s"$tmpDir/rdbm_offset"
      val src = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "v", "updated")
      val cfgs = Map("src_table" ->
        ExtractionTableConfig("src_table", Some(Seq("id")), Some("updated")))
      val ex1 = new FakeExtractor(spark, Map("src_table" -> src))
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex1, "public", base, cfgs,
          ts("2024-01-02 00:00:00"))("src_table"))
      val ex2 = new FakeExtractor(spark, Map("src_table" -> src))
      Graft.sparkExecutor(4).execute(Graft.sparkFlow(spark)
        .extractToStorageFromRDBM(ex2, "public", base, cfgs,
          ts("2024-01-03 00:00:00"), lastUpdatedOffsetSec = 3600)("src_table"))
      // watermark 2024-01-01 10:00:00 minus 1h
      ex2.issuedQueries.exists(_.contains("where updated > '2024-01-01 09:00:00")) shouldBe true
    }

    it("snapshotTemporalTablesFromStorage resolves versions and deletes; plain tables snapshot normally") {
      val base = s"$tmpDir/rdbm_temporal"
      // temporal table: version history with validity intervals
      val versions = Seq(
        (1L, "v1", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00")),
        (1L, "v2", ts("2024-02-01 00:00:00"), ts("9999-12-31 23:59:59")),
        (2L, "gone", ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00"))
      ).toDF("id", "value", "sys_start", "sys_end")
      val tmeta = AuditTableInfo("ttable", Seq("id"),
        Map("temporal" -> "true", "startCol" -> "sys_start", "endCol" -> "sys_end"),
        retainHistory = true)
      Storage.getOrCreateTable(spark, base, tmeta)
        .append(versions, Some("sys_start"), ts("2024-03-02 00:00:00"))
      // plain table beside it
      val pmeta = AuditTableInfo("ptable", Seq("id"), Map.empty, retainHistory = true)
      Storage.getOrCreateTable(spark, base, pmeta)
        .append(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), None, ts("2024-01-01 00:00:00"))

      val flow = Graft.sparkFlow(spark)
        .snapshotTemporalTablesFromStorage(base, ts("2024-04-01 00:00:00"))("ttable", "ptable")
      val (_, done) = Graft.sparkExecutor(4).execute(flow)

      val tt = done.inputs.get[org.apache.spark.sql.Dataset[_]]("ttable").toDF()
      tt.select("id", "value").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
        Array((1L, "v2")) // id 2 deleted before the snapshot ts; 9999 sentinel survives storage
      done.inputs.get[org.apache.spark.sql.Dataset[_]]("ptable").count() shouldBe 2
    }

    it("lowerCaseAll lowercases values and keeps column names") {
      val df = Seq(("Mixed", "UPPER")).toDF("A_Col", "B_Col")
      val out = IngestionUtils.lowerCaseAll(df).toDF()
      out.columns shouldBe Array("A_Col", "B_Col")
      out.collect().head.toSeq shouldBe Seq("mixed", "upper")
    }

    it("defaults retain-history to lastUpdated presence (reference RDBMExtractor.scala:97)") {
      // incremental tables (delta-extracted) keep version history; column-less
      // tables re-extract in full each run and must NOT retain every snapshot
      val e = new PostgresExtractor(spark, JDBCConnection("jdbc:postgresql://x")) {
        override protected def loadQuery(q: String, p: Seq[String]): DataFrame =
          Seq("id").toDF("pk_column")
      }
      e.getTableMetadata("public", "t", Some(Seq("id")), Some("updated"), None)
        .retainHistory shouldBe true
      e.getTableMetadata("public", "t", Some(Seq("id")), None, None)
        .retainHistory shouldBe false
      // explicit override beats the default in both directions
      e.getTableMetadata("public", "t", Some(Seq("id")), None, Some(true))
        .retainHistory shouldBe true
      e.getTableMetadata("public", "t", Some(Seq("id")), Some("updated"), Some(false))
        .retainHistory shouldBe false
    }

    it("temporal extractor marks its table metadata for the snapshot action") {
      val e = new SQLServerTemporalExtractor(spark, JDBCConnection("jdbc:sqlserver://x")) {
        override protected def loadQuery(q: String, p: Seq[String]): DataFrame =
          Seq("id").toDF("pk_column")
      }
      val m = e.getTableMetadata("dbo", "users", Some(Seq("id")), None, None)
      m.meta.get("temporal") shouldBe Some("true")
      m.meta.get("startCol") shouldBe Some("sys_start")
      m.meta.get("endCol") shouldBe Some("sys_end")
      m.retainHistory shouldBe true
    }
  }

  describe("end-to-end incremental ingest with a fake source") {
    it("extracts a delta from the latest stored timestamp into storage") {
      val src = Seq(
        (1L, "a", ts("2024-01-01 10:00:00")),
        (2L, "b", ts("2024-01-05 10:00:00")),
        (3L, "c", ts("2024-02-01 10:00:00"))
      ).toDF("id", "v", "updated")
      val ex = new FakeExtractor(spark, Map("src_table" -> src))
      val cfg = ExtractionTableConfig("src_table", Some(Seq("id")), Some("updated"))

      // initial full load
      val full = ex.getTableDataset("public", cfg, None)
      full.count() shouldBe 3
      full.columns should contain(ex.rdbmRecordLastUpdated)

      val base = s"$tmpDir/ingest"
      val t0 = Storage.getOrCreateTable(spark, base,
        ex.getTableMetadata("public", "src_table", Some(Seq("id")), Some("updated"), None))
      val t1 = t0.append(full, Some(ex.rdbmRecordLastUpdated), ts("2024-02-02 00:00:00"))

      // delta load from the stored max timestamp
      val last = t1.getLatestTimestamp
      last.get shouldBe ts("2024-02-01 10:00:00")
      val delta = ex.getTableDataset("public", cfg, last)
      delta.count() shouldBe 0 // nothing newer in the source

      // new source row appears -> delta picks only it
      val src2 = src.union(Seq((4L, "d", ts("2024-03-01 10:00:00"))).toDF("id", "v", "updated"))
      val ex2 = new FakeExtractor(spark, Map("src_table" -> src2))
      val delta2 = ex2.getTableDataset("public", cfg, last)
      delta2.select("id").as[Long].collect() shouldBe Array(4L)
      ex2.issuedQueries.exists(_.contains("where updated >")) shouldBe true
    }
  }
}
