package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source/domain-level curation — the web-pipeline stage that judges whole
  * PROVIDERS, not individual documents: a domain that is mostly duplicated
  * boilerplate or near-empty pages should be down-weighted everywhere, even
  * for its few good documents (the FineWeb/RefinedWeb per-domain filter
  * shape; waimak has no counterpart — beyond-parity operator).
  *
  * Scale shape: the per-source rollup is one map-combined groupBy over
  * #sources groups (domains are millions, not billions); the exact-dup
  * share reuses the hash-profile trick ([[Dedup]] family) — 64-bit text
  * hashes, never text, ride the dup-count shuffle; the doc-level join-back
  * broadcasts the sources-sized stats frame, so the corpus side never
  * shuffles.
  */
object Domains {

  /** Per-source rollup: doc count, mean char length, short-doc share,
    * corpus-wide exact-dup share, and a deterministic composite
    * `source_score` in [0, 1] (higher = healthier source):
    * `(1 - dup_frac) * (1 - short_frac) * min(1, avg_chars / lenNorm)`,
    * rounded to 6 decimals for engine-stable comparison. */
  def sourceStats(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shortLen: Int = 200, lenNorm: Double = 400.0): DataFrame = {
    val h = md5(col(textCol)) // exact-dup key: hash, never text, shuffles
    val dupCounts = docs.select(h.as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__hc"))
    val flagged = docs
      .select(col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("__len"), h.as("__h"))
      .join(dupCounts, Seq("__h")) // hash equi-join, both sides hash-keyed
      .withColumn("__dup", (col("__hc") > 1).cast("int"))
      .withColumn("__short", (col("__len") < shortLen).cast("int"))
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__len")), 6).as("avg_chars"),
        round(avg(col("__short")), 6).as("short_frac"),
        round(avg(col("__dup")), 6).as("dup_frac"))
      .withColumn("source_score", round(
        (lit(1.0) - col("dup_frac")) * (lit(1.0) - col("short_frac")) *
          least(lit(1.0), col("avg_chars") / lit(lenNorm)), 6))
  }

  /** Annotate every document with its source's rollup score (broadcast
    * join-back) so downstream filters can drop or down-weight whole
    * domains with a plain predicate on `source_score`. */
  def withSourceScore(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shortLen: Int = 200, lenNorm: Double = 400.0): DataFrame = {
    val stats = sourceStats(docs, idCol, textCol, sourceCol, shortLen, lenNorm)
      .select(col("source"), col("source_score"))
    docs.join(broadcast(stats), docs(sourceCol) === stats("source"))
      .drop(stats("source"))
  }
}
