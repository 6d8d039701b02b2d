package graft.metastore

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

class MetastoreException(message: String) extends RuntimeException(message)

/** Secure JDBC credential resolution from a Hadoop credential provider
  * (jceks file): each (jceksKey → jdbcPropertyKey) pair is looked up via
  * `Configuration.getPassword`, with the reference's two failure modes kept
  * distinct — no provider configured at all vs key absent from the
  * configured providers (reference MetastoreUtils.scala:94-115). */
object SecureCredentials {

  val CredentialProviderPath = "hadoop.security.credential.provider.path"

  def resolve(hadoopConf: Configuration, secureProperties: Map[String, String],
      props: java.util.Properties): java.util.Properties = {
    secureProperties.foreach { case (jceksKey, propKey) =>
      Option(hadoopConf.getPassword(jceksKey)) match {
        case Some(cred) => props.setProperty(propKey, new String(cred))
        case None if hadoopConf.get(CredentialProviderPath) == null =>
          throw new MetastoreException(
            s"Could not read secure parameter [$jceksKey]: no credential " +
              s"provider is configured under [$CredentialProviderPath]")
        case None =>
          throw new MetastoreException(
            s"Could not find secure parameter [$jceksKey] in any provider " +
              s"at [${hadoopConf.get(CredentialProviderPath)}]")
      }
    }
    props
  }
}

/** JDBC connection-string templating: the cluster-wide template lives in the
  * Spark conf under `spark.<service>.<cluster>.jdbc.template` with a
  * `DB_NAME` placeholder, so flows address databases symbolically and ops
  * rotate endpoints in one place (reference MetastoreUtils.scala:42-57). */
object JdbcTemplates {
  def jdbcString(spark: SparkSession, service: String, cluster: String,
      database: String): String =
    spark.conf.getOption(s"spark.$service.$cluster.jdbc.template")
      .map(_.replaceFirst("DB_NAME", database))
      .getOrElse(throw new MetastoreException(
        s"No JDBC template for service [$service] cluster [$cluster]: set " +
          s"spark.$service.$cluster.jdbc.template"))
}

/** Metastore DDL submission + generation for parquet-backed external tables.
  * Reference surface: waimak-core/.../metastore/MetastoreUtils.scala:16-188,
  * waimak-hive/.../HiveDBConnector.scala:16-107. */
trait DBConnector {
  def submitResultlessQuery(ddl: String): Unit
  def submitAtomicResultlessQueries(ddls: Seq[String]): Unit = ddls.foreach(submitResultlessQuery)
}

/** Connector that can derive update-location DDLs for a parquet path. */
trait HadoopDBConnector extends DBConnector {

  def database: String
  def forceRecreateTables: Boolean = false

  /** Schema read from one footer of the written parquet — the canonical
    * source for column DDL (reference HiveDBConnector.scala:16-65). */
  protected def schemaOf(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  def createTableFromParquetDDL(tableName: String, pathUri: String,
      schema: StructType, partitionColumns: Seq[String] = Seq.empty,
      ifNotExists: Boolean = true): Seq[String] = {
    val (partCols, dataCols) = schema.fields.partition(f => partitionColumns.contains(f.name))
    val colsDDL = dataCols.map(f => s"`${f.name}` ${f.dataType.catalogString}").mkString(", ")
    val ifne = if (ifNotExists) "if not exists " else ""
    if (partitionColumns.isEmpty)
      Seq(s"create external table $ifne$database.$tableName ($colsDDL) " +
        s"stored as parquet location '$pathUri'")
    else {
      val partDDL = partitionColumns.map { p =>
        val t = partCols.find(_.name == p).map(_.dataType.catalogString).getOrElse("string")
        s"`$p` $t"
      }.mkString(", ")
      Seq(
        s"create external table $ifne$database.$tableName ($colsDDL) " +
          s"partitioned by ($partDDL) stored as parquet location '$pathUri'",
        s"alter table $database.$tableName recover partitions")
    }
  }

  def updateTableLocationDDL(tableName: String, pathUri: String): String =
    s"alter table $database.$tableName set location '$pathUri'"

  def dropTableDDL(tableName: String): String =
    s"drop table if exists $database.$tableName"

  /** Full DDL set to (re)point a table at a new parquet snapshot. */
  def updateTableParquetLocationDDLs(spark: SparkSession, tableName: String,
      pathUri: String, partitionColumns: Seq[String] = Seq.empty): Seq[String] = {
    val schema = schemaOf(spark, pathUri)
    if (partitionColumns.nonEmpty || forceRecreateTables)
      dropTableDDL(tableName) +:
        createTableFromParquetDDL(tableName, pathUri, schema, partitionColumns, ifNotExists = false)
    else
      createTableFromParquetDDL(tableName, pathUri, schema) :+
        updateTableLocationDDL(tableName, pathUri)
  }
}

/** DDL submission over a plain JDBC connection. The connection factory is
  * injectable: production supplies the vendor driver's `DriverManager`
  * call, tests a recording fake — so connector logic is testable with zero
  * vendor dependencies on the classpath. One connection per atomic batch;
  * statements run in order on one `Statement`, and the connection always
  * closes. Plain properties merge with jceks-resolved secure properties
  * at connect time (reference MetastoreUtils.scala:94-115). */
trait JdbcSubmitting extends DBConnector {

  def jdbcUrl: String
  def connectionFactory: (String, java.util.Properties) => java.sql.Connection
  def properties: Map[String, String]
  def secureProperties: Map[String, String]
  def hadoopConf: Option[Configuration]

  private[metastore] def allProperties: java.util.Properties = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    if (secureProperties.nonEmpty) {
      val conf = hadoopConf.getOrElse(throw new MetastoreException(
        "secureProperties are set but no hadoopConf was supplied to resolve them"))
      SecureCredentials.resolve(conf, secureProperties, props)
    }
    props
  }

  def submitResultlessQuery(ddl: String): Unit =
    submitAtomicResultlessQueries(Seq(ddl))

  override def submitAtomicResultlessQueries(ddls: Seq[String]): Unit = {
    val conn = connectionFactory(jdbcUrl, allProperties)
    try {
      val st = conn.createStatement()
      try ddls.foreach(st.execute) finally st.close()
    } finally conn.close()
  }
}

/** Generic JDBC metastore connector (HiveServer2-compatible column-list
  * DDLs). Reference waimak-impala/.../ImpalaDBConnector.scala:19-76 for the
  * submission shape. */
final case class JdbcDBConnector(
    jdbcUrl: String,
    database: String,
    connectionFactory: (String, java.util.Properties) => java.sql.Connection =
      (url, props) => java.sql.DriverManager.getConnection(url, props),
    properties: Map[String, String] = Map.empty,
    secureProperties: Map[String, String] = Map.empty,
    hadoopConf: Option[Configuration] = None,
    override val forceRecreateTables: Boolean = false)
  extends HadoopDBConnector with JdbcSubmitting

/** Impala's documented DDL form: `CREATE EXTERNAL TABLE ... LIKE PARQUET
  * '<footer file>'` — Impala infers the columns from a concrete parquet
  * footer server-side, so no driver-side schema read happens at all
  * (reference ImpalaDBConnector.scala:17-39). Partition columns are typed
  * string, matching the reference. */
trait ImpalaParquetDDL extends HadoopDBConnector {

  def fileSystem: FileSystem

  /** Never consulted — the DDL ships a footer-file path instead of a column
    * list; overriding avoids the generic path's driver-side parquet read. */
  override protected def schemaOf(spark: SparkSession, path: String): StructType =
    new StructType()

  override def createTableFromParquetDDL(tableName: String, pathUri: String,
      schema: StructType, partitionColumns: Seq[String],
      ifNotExists: Boolean): Seq[String] = {
    val qualified = fileSystem.makeQualified(new Path(pathUri))
    // glob through the partition folders (in declaration order:
    // base/p1=*/p2=*/part-*.parquet) for the first part file
    val glob = (partitionColumns.map(_ + "=*") :+ "part-*.parquet")
      .foldLeft(qualified)((p, c) => new Path(p, c))
    val footer = fileSystem.globStatus(glob).sortBy(_.getPath.toUri.getPath)
      .headOption.map(_.getPath).getOrElse(throw new MetastoreException(
        s"Could not find a parquet file under '$qualified' to infer schema " +
          s"for table '$tableName'"))
    val ifne = if (ifNotExists) "if not exists " else ""
    if (partitionColumns.isEmpty)
      Seq(s"create external table $ifne$database.$tableName like parquet " +
        s"'$footer' stored as parquet location '$qualified'")
    else {
      val partDDL = partitionColumns.map(_ + " string").mkString(", ")
      Seq(
        s"create external table $ifne$database.$tableName like parquet " +
          s"'$footer' partitioned by ($partDDL) stored as parquet location '$qualified'",
        s"alter table $database.$tableName recover partitions")
    }
  }
}

/** Impala metastore connector: footer-file DDLs over JDBC. */
final case class ImpalaJdbcConnector(
    jdbcUrl: String,
    database: String,
    fileSystem: FileSystem,
    connectionFactory: (String, java.util.Properties) => java.sql.Connection =
      (url, props) => java.sql.DriverManager.getConnection(url, props),
    properties: Map[String, String] = Map.empty,
    secureProperties: Map[String, String] = Map.empty,
    hadoopConf: Option[Configuration] = None,
    override val forceRecreateTables: Boolean = false)
  extends ImpalaParquetDDL with JdbcSubmitting

/** Runs DDLs through `spark.sql` against the session catalog (Hive when
  * enabled). Reference: HiveDBConnector.scala:94-107. */
final case class SparkSqlConnector(spark: SparkSession, database: String,
    createDatabaseIfNotExists: Boolean = false,
    override val forceRecreateTables: Boolean = false)
  extends HadoopDBConnector {

  def submitResultlessQuery(ddl: String): Unit = {
    if (createDatabaseIfNotExists) spark.sql(s"create database if not exists $database")
    spark.sql(ddl)
  }
}

/** Collects DDLs without running them — for tests and dry runs. */
final class RecordingConnector(val database: String) extends HadoopDBConnector {
  private val buf = scala.collection.mutable.ArrayBuffer[String]()
  def submitResultlessQuery(ddl: String): Unit = buf += ddl
  def ddls: Seq[String] = buf.toSeq
}
