package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.storage.{AuditTable, AuditTableInfo, Storage}

/** Persisted BM25 postings index — the sparse-retrieval twin of
  * [[DedupIndex]] (MinHash) and [[AnnIndex]] (dense IVF-PQ): the
  * operational loop where a corpus arrives INCREMENTALLY and queries must
  * never pay corpus tokenization again.
  *
  * {{{
  * day 0:  indexBatch(table, crawl0, ...)        // tokenize once, ever
  * day N:  indexBatch(table, crawlN, ...)        // new + re-ingested docs
  * query:  Ranking.bm25Retrieve(
  *           bm25IndexAsOf(table, now), queries, ...)
  * }}}
  *
  * The store is an audit table (PK = doc_id) of ONE compact row per
  * document: its distinct terms, their counts, and the document length —
  * NOT raw (doc, term) posting rows. One row per doc means a re-ingested
  * document REPLACES its whole posting list via the PK snapshot (a (doc,
  * term) PK would leave stale rows for terms the new version dropped),
  * and `retainHistory = false` lets compaction physically drop superseded
  * versions. Token-less documents keep a row (empty arrays, dl = 0): they
  * hold no postings but still count toward N and avgdl, exactly as
  * [[Ranking.bm25TopK]] counts them.
  *
  * BM25 contributions depend on GLOBAL stats (df, N, avgdl), so they are
  * never stored — [[bm25IndexAsOf]] re-derives the (term, doc, c_i) frame
  * from the snapshot (df/stats aggregates + one map-side expression;
  * tokenization, the expensive part, is already paid).
  *
  * Time-travel caveats: `snapshot(asOf)` filters ROW-level (it must read
  * every readable region — a late append can carry timestamps <= asOf),
  * so retrieval-as-of-yesterday still scans regions appended today; and
  * `retainHistory = false` means a `compact()` physically drops
  * superseded posting rows — time travel is only defined back to the last
  * compaction. The index is an operational serving store, not an archive;
  * pass `retainHistory = true` through your own table-info if you need
  * durable history.
  */
object SparseIndex {

  val DefaultTableName = "bm25_postings"

  /** Create or reopen a postings store under `basePath`. */
  def openOrCreate(spark: SparkSession, basePath: String,
      tableName: String = DefaultTableName): AuditTable =
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(tableName, Seq("doc_id"),
        Map("content" -> "bm25-postings"), retainHistory = false))

  /** Tokenize `docs` ONCE and append their compact posting rows as one new
    * region. Term arrays are sorted (deterministic row bytes) and `dl` is
    * the full token count. Returns the refreshed table handle.
    *
    * A doc_id appearing with CONFLICTING texts inside one batch fails
    * loudly in-plan (the [[graft.storage.AuditTable.append]] idiom): PK
    * replace resolves duplicates ACROSS batches by append timestamp, but
    * within a batch neither version is "latest" — silently merging them
    * would store a chimera posting row matching no document version.
    * Byte-identical repeats of the same (id, text) collapse harmlessly. */
  def indexBatch(
      table: AuditTable,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ts: Timestamp): AuditTable = {
    val one = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .groupBy(col("doc_id"))
      // countDistinct skips NULLs, so the null version must be counted as
      // its own version explicitly — (id, "text") + (id, null) in one batch
      // is a conflict, not a silent win for the non-null text
      .agg((countDistinct(col("__text"))
          + max(col("__text").isNull.cast("int"))).as("__nv"),
        max(col("__text")).as("__text"))
      .select(col("doc_id"),
        when(col("__nv") > 1, raise_error(concat(
          lit(s"SparseIndex.indexBatch: doc_id "), col("doc_id").cast("string"),
          lit(" carries conflicting texts in one batch — PK replace is only" +
            " defined across batches; dedup the batch first"))))
          .otherwise(col("__text")).as("__text"))
    val rows = one
      .select(col("doc_id"), TextFunctions.tokens(col("__text")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("term"),
        size(col("toks")).cast("long").as("dl"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(when(col("term").isNotNull, 1)).as("tf"), max(col("dl")).as("dl"))
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(when(col("term").isNotNull,
          struct(col("term"), col("tf"))))).as("post"),
        max(col("dl")).as("dl"))
      .select(col("doc_id"),
        col("post.term").as("terms"), col("post.tf").as("tfs"), col("dl"))
    table.append(rows, lastUpdatedCol = None, appendTimestamp = ts)
  }

  /** The (term, doc_id, c_i) contribution index for the corpus state as of
    * `asOf` — PK-deduped (one latest posting row per doc), stats over
    * every live document including token-less ones, micro-unit scale in
    * the `c_i` metadata. Feed to [[Ranking.bm25Retrieve]] (materialize
    * first when serving many query batches). */
  def bm25IndexAsOf(
      table: AuditTable,
      asOf: Timestamp,
      k1: Double = 1.2,
      b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    // materialized: the returned plan reads the snapshot THREE times
    // (doc-length stats, df aggregate, scoring join) and the PK window
    // dedup over the full region history must not run per subtree
    val snap = table.snapshot(asOf).map(Materialize.apply).getOrElse(
      throw new IllegalStateException(
        s"no indexed regions — indexBatch first"))
    // snapshot() row-filters on the audit timestamp, so an asOf EARLIER
    // than every append comes back as an empty frame, not None — and an
    // empty index would silently answer every query with zero rows
    if (snap.isEmpty)
      throw new IllegalStateException(
        s"no indexed documents at or before $asOf — later batches exist; " +
          "check the asOf timestamp")
    val postings = snap
      .select(col("doc_id"), col("dl"),
        explode(arrays_zip(col("terms"), col("tfs"))).as("p"))
      .select(col("p.terms").as("term"), col("doc_id"),
        col("p.tfs").as("tf"), col("dl"))
    Ranking.bm25IndexFromPostings(postings,
      snap.select(col("doc_id"), col("dl")), k1, b, scale)
  }
}
