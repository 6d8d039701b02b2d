package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.{AuditTable, AuditTableInfo, Storage}

/** Persisted MinHash dedup index — the operational daily-crawl loop:
  *
  * {{{
  * day 0:  indexBatch(table, crawl0, ...)           // shingle+sign once
  * day N:  dedupAgainst(table, now, crawlN, ...)    // batch vs index pairs
  *         indexBatch(table, crawlN-minus-dups ...) // extend the index
  * }}}
  *
  * The index is an audit table (PK = doc_id) of [[Dedup.minHashSignatures]]
  * frames. Storing SIGNATURES instead of text means:
  *
  *  - the corpus is shingled exactly once, ever — a new batch only pays
  *    signature cost for itself, then a banded equi-join against the index
  *    (id+bucket rows through the shuffle, never text);
  *  - the index is ~64 longs per doc regardless of document size;
  *  - re-indexed doc ids REPLACE their old signature via the audit table's
  *    PK snapshot semantics (latest `_de_last_updated` wins), and
  *    `retainHistory = false` lets compaction physically drop superseded
  *    signatures;
  *  - region pruning applies: `snapshot(asOf)` reads only live regions, so
  *    dedup-as-of-yesterday does not scan regions appended today.
  *
  * Composes two existing subsystems — [[Dedup]] (banded LSH) and
  * [[graft.storage]] (audit tables) — with no new physics.
  */
object DedupIndex {

  val DefaultTableName = "minhash_index"

  /** Create or reopen a signature index table under `basePath`. */
  def openOrCreate(spark: SparkSession, basePath: String,
      tableName: String = DefaultTableName): AuditTable =
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(tableName, Seq("doc_id"),
        Map("content" -> "minhash-signatures"), retainHistory = false))

  /** Sign `docs` and append the signatures as one new region. Returns the
    * refreshed table handle (audit tables are one-shot for mutations). */
  def indexBatch(
      table: AuditTable,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ts: Timestamp,
      bands: Int = 8,
      rowsPerBand: Int = 8,
      shingleWords: Int = 3): AuditTable =
    table.append(
      Dedup.minHashSignatures(docs, idCol, textCol, bands, rowsPerBand, shingleWords),
      lastUpdatedCol = None, appendTimestamp = ts)

  /** Near-dup pairs (id_new, id_idx, est_jaccard) between a fresh `batch`
    * and the index state as of `asOf` — without re-scanning or re-shingling
    * the indexed corpus. Batch docs are signed here; index signatures come
    * from `snapshot(asOf)` (PK-deduped: one latest signature per doc). */
  def dedupAgainst(
      table: AuditTable,
      asOf: Timestamp,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 8,
      rowsPerBand: Int = 8,
      shingleWords: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val newSigned =
      Dedup.minHashSignatures(batch, idCol, textCol, bands, rowsPerBand, shingleWords)
        .transform(Materialize.apply)
    table.snapshot(asOf) match {
      case Some(index) =>
        Dedup.minHashLshPairsAgainst(newSigned, index.select(col("doc_id"), col("sig")),
          bands, rowsPerBand, threshold)
      case None => // empty index: nothing to collide with
        newSigned.select(col("doc_id").as("id_new"), col("doc_id").as("id_idx"),
          lit(0.0).as("est_jaccard")).where(lit(false))
    }
  }
}
