package graft.dataflow.spark

import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.dataflow.FlowException
import graft.dataflow.spark.actions._
import graft.dataflow.spark.commit._
import graft.metastore.{JdbcDBConnector, RecordingConnector}

class CommitSpec extends SparkTestBase with Matchers {

  private def executor = Graft.sparkExecutor(8)

  describe("commit/push") {
    it("stages, moves and registers snapshots atomically") {
      val out = s"$tmpDir/published"
      val connector = new RecordingConnector("testdb")
      val flow = Graft.sparkFlow(spark, s"$tmpDir/commit-tmp")
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .openFileParquet(s"${sf()}/nation.parquet", "nation")
        .commit("publish")("region", "nation")
        .push("publish")(ParquetDataCommitter(out)
          .snapshotFolder("snap=20240101")
          .withConnector(connector))
      val (executed, _) = executor.execute(flow)

      spark.read.parquet(s"$out/region/snap=20240101").count() shouldBe 5
      spark.read.parquet(s"$out/nation/snap=20240101").count() shouldBe 25
      connector.ddls.exists(_.contains("create external table")) shouldBe true
      connector.ddls.exists(_.contains("set location")) shouldBe true
    }

    it("refuses to overwrite an existing snapshot") {
      val out = s"$tmpDir/published2"
      def mkFlow = Graft.sparkFlow(spark, s"$tmpDir/commit-tmp2")
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .commit("p2")("region")
        .push("p2")(ParquetDataCommitter(out).snapshotFolder("snap=1"))
      executor.execute(mkFlow)
      val e = intercept[FlowException] { executor.execute(mkFlow) }
      e.getMessage should include("already exists")
    }

    it("keeps only the last N snapshots with date-based cleanup") {
      val out = s"$tmpDir/published3"
      def flowFor(snap: String) = Graft.sparkFlow(spark, s"$tmpDir/commit-tmp3")
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .commit("p3")("region")
        .push("p3")(ParquetDataCommitter(out)
          .snapshotFolder(snap).dateBasedSnapshotCleanup(2))
      executor.execute(flowFor("snap=20240101"))
      executor.execute(flowFor("snap=20240102"))
      executor.execute(flowFor("snap=20240103"))
      new java.io.File(s"$out/region").list().sorted shouldBe
        Array("snap=20240102", "snap=20240103")
    }

    it("fails fast on commit without push and push without commit") {
      val f1 = Graft.sparkFlow(spark, s"$tmpDir/ct4")
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .commit("orphan")("region")
      intercept[FlowException] { executor.execute(f1) }.getMessage should include("without a push")

      val f2 = Graft.sparkFlow(spark, s"$tmpDir/ct5")
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .push("ghost")(ParquetDataCommitter(s"$tmpDir/x"))
      intercept[FlowException] { executor.execute(f2) }.getMessage should include("without commits")
    }

    it("caches a committed label that other actions also consume") {
      val out = s"$tmpDir/published-cached"
      val flow = Graft.sparkFlow(spark, s"$tmpDir/commit-cache-tmp")
        .copy(removeTempAfterExecution = false)
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .transform("region")("enriched")(_.withColumn("x", org.apache.spark.sql.functions.lit(1)))
        .transform("enriched")("consumer")(_.select("r_regionkey")) // second consumer
        .commit("pc")("enriched")
        .push("pc")(ParquetDataCommitter(out))
      executor.execute(flow)
      spark.read.parquet(s"$out/enriched").count() shouldBe 5
      // the reused committed label went through the parquet cache in the temp dir
      new java.io.File(s"$tmpDir/commit-cache-tmp").listFiles()
        .exists(_.getName.contains("enriched")) shouldBe true
    }

    it("does not double-cache a committed label the user already cached") {
      val out = s"$tmpDir/published-usercached"
      val flow = Graft.sparkFlow(spark, s"$tmpDir/commit-ucache-tmp")
        .copy(removeTempAfterExecution = false)
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .transform("region")("enriched2")(_.withColumn("x", org.apache.spark.sql.functions.lit(1)))
        .transform("enriched2")("consumer2")(_.select("r_regionkey"))
        .cacheAsParquet("enriched2") // user cached it themselves
        .commit("pu")("enriched2")
        .push("pu")(ParquetDataCommitter(out))
      // a second cache wrap would overwrite the parquet path it reads from
      executor.execute(flow)
      spark.read.parquet(s"$out/enriched2").count() shouldBe 5
    }

    it("keeps a user's planned cache request for a committed label") {
      // the commit path must not replace sparkCachePlanned(label, level)
      // with its own AsParquet(None) request
      import graft.dataflow.spark.caching._
      val out = s"$tmpDir/published-plannedcache"
      val flow = Graft.sparkFlow(spark, s"$tmpDir/commit-pcache-tmp")
        .copy(removeTempAfterExecution = false)
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .transform("region")("enriched3")(_.withColumn("x", org.apache.spark.sql.functions.lit(1)))
        .transform("enriched3")("consumer3")(_.select("r_regionkey"))
        .sparkCachePlanned("enriched3")
        .commit("pp")("enriched3")
        .push("pp")(ParquetDataCommitter(out))
      executor.execute(flow)
      spark.read.parquet(s"$out/enriched3").count() shouldBe 5
      // and no parquet-cache file was written for it (sparkCache won)
      new java.io.File(s"$tmpDir/commit-pcache-tmp").listFiles()
        .exists(_.getName.contains("enriched3")) shouldBe false
    }

    it("skips committed-label caching when the flow has no temp folder") {
      // custom committer that needs no staging folder
      val sink = scala.collection.mutable.ArrayBuffer[Long]()
      val committer = new DataCommitter {
        def stage(n: String, e: Seq[CommitEntry], f: SparkDataFlow) = f
        def move(n: String, e: Seq[CommitEntry], f: SparkDataFlow) =
          f.addAction(new SparkAction(e.map(_.label).toList, List.empty, s"sink:$n")({ (ents, _) =>
            sink += ents.get[org.apache.spark.sql.Dataset[_]](e.head.label).count(); Seq.empty
          }))
        def finish(n: String, e: Seq[CommitEntry], f: SparkDataFlow) = f
        def validate(f: SparkDataFlow, n: String, e: Seq[CommitEntry]): Unit = ()
      }
      val flow = Graft.sparkFlow(spark) // NO temp folder
        .openFileParquet(s"${sf()}/region.parquet", "region")
        .transform("region")("r2")(_.select("r_regionkey"))
        .transform("r2")("r3")(_.limit(1))
        .commit("nt")("r2")
        .push("nt")(committer)
      executor.execute(flow) // previously failed: cacheAsParquet needs a temp folder
      sink.toSeq shouldBe Seq(5L)
    }

    it("partitioned commit writes hive-partition folders") {
      val out = s"$tmpDir/published4"
      val flow = Graft.sparkFlow(spark, s"$tmpDir/ct6")
        .openFileParquet(s"${sf()}/nation.parquet", "nation")
        .commit("p4", Some(Left(Seq("n_regionkey"))))("nation")
        .push("p4")(ParquetDataCommitter(out))
      executor.execute(flow)
      new java.io.File(s"$out/nation").list().count(_.startsWith("n_regionkey=")) shouldBe 5
    }

    it("JDBC connector runs an atomic DDL batch on one statement and always closes") {
      import java.lang.reflect.{InvocationHandler, Method, Proxy}
      val executed = scala.collection.mutable.ArrayBuffer[String]()
      val events = scala.collection.mutable.ArrayBuffer[String]()
      def proxy[T](cls: Class[T])(handle: (String, Array[AnyRef]) => AnyRef): T =
        Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
          new InvocationHandler {
            def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
              handle(m.getName, args)
          }).asInstanceOf[T]
      val stmt = proxy(classOf[java.sql.Statement]) {
        case ("execute", args) => executed += args(0).toString; java.lang.Boolean.TRUE
        case ("close", _) => events += "stmt-close"; null
        case _ => null
      }
      val conn = proxy(classOf[java.sql.Connection]) {
        case ("createStatement", _) => stmt
        case ("close", _) => events += "conn-close"; null
        case _ => null
      }
      val connector = JdbcDBConnector("jdbc:impala://h:21050", "testdb", (_, _) => conn)
      connector.submitAtomicResultlessQueries(Seq("create table t", "alter table t"))
      executed.toSeq shouldBe Seq("create table t", "alter table t")
      events.toSeq shouldBe Seq("stmt-close", "conn-close")
      // DDL generation comes from the shared HadoopDBConnector trait
      connector.dropTableDDL("t") shouldBe "drop table if exists testdb.t"
    }
  }
}
