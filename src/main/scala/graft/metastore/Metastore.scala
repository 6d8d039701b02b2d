package graft.metastore

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

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

/** Submits DDLs over a plain JDBC connection — the Impala/HiveServer2
  * shape (reference waimak-impala/.../ImpalaDBConnector.scala:19-76). The
  * connection factory is injectable: production supplies the vendor
  * driver's `DriverManager` call, tests a recording fake — so the
  * connector logic is testable with zero vendor dependencies on the
  * classpath. One connection per atomic batch; statements run in order on
  * one `Statement`, and the connection always closes. */
final case class JdbcDBConnector(
    jdbcUrl: String,
    database: String,
    connectionFactory: String => java.sql.Connection =
      url => java.sql.DriverManager.getConnection(url),
    override val forceRecreateTables: Boolean = false)
  extends HadoopDBConnector {

  def submitResultlessQuery(ddl: String): Unit =
    submitAtomicResultlessQueries(Seq(ddl))

  override def submitAtomicResultlessQueries(ddls: Seq[String]): Unit = {
    val conn = connectionFactory(jdbcUrl)
    try {
      val st = conn.createStatement()
      try ddls.foreach(st.execute) finally st.close()
    } finally conn.close()
  }
}

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
