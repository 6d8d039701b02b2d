package graft.ingestion

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import java.sql.Timestamp

import graft.dataflow.spark.{SparkAction, SparkDataFlow}
import graft.storage.{AuditTable, AuditTableInfo}
import graft.storage.StorageActions._

/** Flow-level RDBM ingestion: one call wires metadata discovery, audit-table
  * open/create, incremental delta extraction and the storage append for N
  * tables — the reference's flagship pipeline shape
  * (RDBMIngestionActions.scala:41-139).
  *
  * Scale notes: each table becomes an independent chain of flow actions, so
  * the executor's parallel scheduler extracts tables concurrently (bounded by
  * its pool); per-table reads shard into `maxRowsPerPartition` JDBC range
  * predicates, so a single huge table never lands in one partition.
  */
object IngestionActions {

  implicit class IngestionFlowOps(val flow: SparkDataFlow) extends AnyVal {

    /** Extract N tables from a RDBM into the storage layer: per table,
      * `getOrCreateAuditTable` (metadata from the extractor, PKs discovered
      * from the DB unless configured) → `extractFromRDBM` (delta from the
      * stored watermark) → `writeToStorage` (append + optional windowed
      * compaction). Reference RDBMIngestionActions.scala:41-65.
      *
      * @param lastUpdatedOffsetSec seconds subtracted from the stored
      *   watermark before it is pushed to the DB (safety margin for source
      *   clock skew / late transactions, re-reading a sliver instead of
      *   missing rows — appends are PK-deduplicated at snapshot time).
      */
    def extractToStorageFromRDBM(extractor: RDBMExtractor,
        dbSchema: String,
        storageBasePath: String,
        tableConfigs: Map[String, ExtractionTableConfig],
        extractTimestamp: Timestamp,
        lastUpdatedOffsetSec: Long = 0,
        forceFullLoad: Boolean = false,
        compactDuring: Option[(Int, Int)] = None,
        labelPrefix: String = "audittable")(tables: String*): SparkDataFlow = {
      tables.foreach(t => require(tableConfigs.contains(t),
        s"extractToStorageFromRDBM: no ExtractionTableConfig for table [$t]"))
      def metadata(tableName: String): AuditTableInfo = {
        val cfg = tableConfigs(tableName)
        extractor.getTableMetadata(dbSchema, tableName, cfg.primaryKeys,
          cfg.lastUpdatedColumn, cfg.forceRetainStorageHistory)
      }
      flow
        .getOrCreateAuditTable(storageBasePath, metadata, labelPrefix)(tables: _*)
        .foldLeftOver(tables) { (fl: SparkDataFlow, tableName) =>
          fl.extractFromRDBM(extractor, dbSchema, lastUpdatedOffsetSec,
              tableName, tableConfigs(tableName), forceFullLoad, labelPrefix)
            .writeToStorage(tableName, Some(extractor.rdbmRecordLastUpdated),
              extractTimestamp, compactDuring, labelPrefix)
        }
    }

    /** Extract one table's delta as the flow entity `label`: the incremental
      * watermark is the audit table's max stored last-updated, minus the
      * safety offset (the extractor clamps dialect floors itself).
      * Reference RDBMIngestionActions.scala:80-104. */
    def extractFromRDBM(extractor: RDBMExtractor,
        dbSchema: String,
        lastUpdatedOffsetSec: Long,
        label: String,
        tableConfig: ExtractionTableConfig,
        forceFullLoad: Boolean = false,
        labelPrefix: String = "audittable"): SparkDataFlow = {
      val auditLabel = s"${labelPrefix}_$label"
      flow.addAction(new SparkAction(List(auditLabel), List(label),
        s"extractFromRDBM:$label")({ (entities, _) =>
        val table = entities.get[AuditTable](auditLabel)
        val lastUpdated = table.getLatestTimestamp
          .map(t => Timestamp.valueOf(t.toLocalDateTime.minusSeconds(lastUpdatedOffsetSec)))
        val cfg =
          if (forceFullLoad) tableConfig.copy(forceFullLoad = true) else tableConfig
        Seq(Some(extractor.getTableDataset(dbSchema, cfg, lastUpdated)))
      }))
    }

    /** Snapshot N stored tables at `ts`, resolving SQL Server temporal
      * tables correctly: a temporal table's audit history holds VERSIONS
      * (with validity intervals), so plain PK-window `snapshot` would
      * resurrect deleted rows — [[TemporalSnapshot]] keeps the version whose
      * interval covers `ts` and emits nothing for deleted PKs. Temporal
      * tables are recognised by the `temporal=true` marker the
      * [[SQLServerTemporalExtractor]] writes into the table metadata.
      * Reference RDBMIngestionActions.scala:120-139. */
    def snapshotTemporalTablesFromStorage(storageBasePath: String,
        snapshotTimestamp: Timestamp,
        labelPrefix: String = "audittable")(tables: String*): SparkDataFlow =
      flow
        .getAuditTable(storageBasePath, labelPrefix)(tables: _*)
        .foldLeftOver(tables) { (fl: SparkDataFlow, tableName) =>
          val auditLabel = s"${labelPrefix}_$tableName"
          fl.addAction(new SparkAction(List(auditLabel), List(tableName),
            s"snapshotTemporalTablesFromStorage:$tableName")({ (entities, _) =>
            val table = entities.get[AuditTable](auditLabel)
            val meta = table.info.meta
            if (!meta.get("temporal").contains("true"))
              Seq(table.snapshot(snapshotTimestamp))
            else {
              val startCol = meta.getOrElse("startCol",
                throw new IllegalStateException(
                  s"temporal table [$tableName] metadata lacks startCol"))
              val endCol = meta.getOrElse("endCol",
                throw new IllegalStateException(
                  s"temporal table [$tableName] metadata lacks endCol"))
              Seq(table.allBetween(None, Some(snapshotTimestamp))
                .map(ds => TemporalSnapshot(ds.toDF(), table.info.primaryKeys,
                  startCol, endCol, snapshotTimestamp)))
            }
          }))
        }
  }
}

/** Small ingestion utilities (reference RDBMIngestionUtils.scala:14-18). */
object IngestionUtils {

  /** Lowercase every column VALUE (names are preserved) — the reference's
    * normalisation for case-insensitive source databases; non-string columns
    * pass through Spark's implicit cast-to-string, matching the reference's
    * behaviour exactly. */
  def lowerCaseAll(df: Dataset[_]): Dataset[_] = {
    val cols = df.schema.fieldNames.map(f => lower(col(f)).as(f))
    df.toDF().select(cols.toIndexedSeq: _*)
  }
}
