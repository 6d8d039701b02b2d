package graft.metastore

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileSystem
import org.apache.hadoop.security.alias.CredentialProviderFactory
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class MetastoreSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  /** Recording connection factory: captures the properties handed to the
    * driver and swallows every statement. */
  private def recordingFactory(seen: java.util.Properties,
      executed: scala.collection.mutable.ArrayBuffer[String]) = {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    def proxy[T](cls: Class[T])(handle: (String, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
            handle(m.getName, args)
        }).asInstanceOf[T]
    val stmt = proxy(classOf[java.sql.Statement]) {
      case ("execute", args) => executed += args(0).toString; java.lang.Boolean.TRUE
      case _ => null
    }
    val conn = proxy(classOf[java.sql.Connection]) {
      case ("createStatement", _) => stmt
      case _ => null
    }
    (url: String, props: java.util.Properties) => { seen.putAll(props); conn }
  }

  describe("secure jceks credentials") {

    def jceksConf(entries: Map[String, String]): Configuration = {
      val dir = new java.io.File(s"$tmpDir/jceks"); dir.mkdirs()
      val f = new java.io.File(dir, s"creds-${java.util.UUID.randomUUID()}.jceks")
      val conf = new Configuration()
      conf.set(SecureCredentials.CredentialProviderPath,
        s"jceks://file${f.getAbsolutePath}")
      val provider = CredentialProviderFactory.getProviders(conf).get(0)
      entries.foreach { case (k, v) => provider.createCredentialEntry(k, v.toCharArray) }
      provider.flush()
      conf
    }

    it("resolves a password from a local jceks file into the JDBC properties") {
      val conf = jceksConf(Map("db.password.alias" -> "s3cret"))
      val seen = new java.util.Properties()
      val executed = scala.collection.mutable.ArrayBuffer[String]()
      val connector = JdbcDBConnector("jdbc:impala://h:21050", "testdb",
        recordingFactory(seen, executed),
        properties = Map("user" -> "etl"),
        secureProperties = Map("db.password.alias" -> "password"),
        hadoopConf = Some(conf))
      connector.submitResultlessQuery("create table t")
      executed.toSeq shouldBe Seq("create table t")
      seen.getProperty("user") shouldBe "etl"
      seen.getProperty("password") shouldBe "s3cret"
    }

    it("fails distinctly for a missing key vs no provider configured") {
      val seen = new java.util.Properties()
      val executed = scala.collection.mutable.ArrayBuffer[String]()
      val withProvider = JdbcDBConnector("jdbc:x", "db",
        recordingFactory(seen, executed),
        secureProperties = Map("absent.key" -> "password"),
        hadoopConf = Some(jceksConf(Map("other" -> "x"))))
      intercept[MetastoreException] {
        withProvider.submitResultlessQuery("q")
      }.getMessage should include("Could not find secure parameter [absent.key]")

      val noProvider = withProvider.copy(hadoopConf = Some(new Configuration(false)))
      intercept[MetastoreException] {
        noProvider.submitResultlessQuery("q")
      }.getMessage should include("no credential provider is configured")
    }
  }

  describe("JDBC templates") {
    it("substitutes DB_NAME in the cluster template from the Spark conf") {
      spark.conf.set("spark.impala.prod.jdbc.template", "jdbc:impala://prod-lb:21050/DB_NAME;SSL=1")
      JdbcTemplates.jdbcString(spark, "impala", "prod", "analytics") shouldBe
        "jdbc:impala://prod-lb:21050/analytics;SSL=1"
      intercept[MetastoreException] {
        JdbcTemplates.jdbcString(spark, "impala", "dr", "analytics")
      }.getMessage should include("spark.impala.dr.jdbc.template")
    }
  }

  describe("Impala LIKE PARQUET DDLs") {

    def fs: FileSystem = FileSystem.get(spark.sparkContext.hadoopConfiguration)

    it("points the DDL at a concrete footer file instead of a column list") {
      val path = s"$tmpDir/impala_plain"
      Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(path)
      val c = ImpalaJdbcConnector("jdbc:impala://h:21050", "testdb", fs)
      val ddls = c.updateTableParquetLocationDDLs(spark, "t1", path)
      ddls.head should include("create external table if not exists testdb.t1 like parquet 'file:")
      ddls.head should include("part-")
      ddls.head should include(s"stored as parquet location 'file:$path'")
      // the create qualifies the location; the alter passes the caller's URI through
      ddls.last shouldBe s"alter table testdb.t1 set location '$path'"
    }

    it("partitioned form globs through partition folders and recovers partitions") {
      val path = s"$tmpDir/impala_part"
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p")
        .write.mode("overwrite").partitionBy("p").parquet(path)
      val c = ImpalaJdbcConnector("jdbc:impala://h:21050", "testdb", fs)
      val ddls = c.updateTableParquetLocationDDLs(spark, "t2", path, Seq("p"))
      // partitioned snapshots drop + recreate (same policy as the generic form)
      ddls.head shouldBe "drop table if exists testdb.t2"
      ddls(1) should include("like parquet 'file:")
      ddls(1) should include("/p=")
      ddls(1) should include("partitioned by (p string)")
      ddls.last shouldBe "alter table testdb.t2 recover partitions"
    }

    it("finds the footer under two partition levels in declaration order") {
      // regression: a foldRight built base/p2=*/p1=*/part-* (reversed), so any
      // table with 2+ partition columns always threw MetastoreException
      val path = s"$tmpDir/impala_part2"
      Seq((1L, "a", "x", "m"), (2L, "b", "y", "n")).toDF("id", "v", "p1", "p2")
        .write.mode("overwrite").partitionBy("p1", "p2").parquet(path)
      val c = ImpalaJdbcConnector("jdbc:impala://h:21050", "testdb", fs)
      val ddls = c.updateTableParquetLocationDDLs(spark, "t4", path, Seq("p1", "p2"))
      ddls(1) should include regex "/p1=[^/]+/p2=[^/]+/part-"
      ddls(1) should include("partitioned by (p1 string, p2 string)")
    }

    it("fails with a clear error when no parquet file exists yet") {
      val c = ImpalaJdbcConnector("jdbc:impala://h:21050", "testdb", fs)
      intercept[MetastoreException] {
        c.updateTableParquetLocationDDLs(spark, "t3", s"$tmpDir/impala_missing")
      }.getMessage should include("Could not find a parquet file")
    }
  }
}
