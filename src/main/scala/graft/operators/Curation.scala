package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** One-call corpus report — the "first look at a new crawl" primitive.
  * Composes the per-document signals this library already computes into a
  * per-source summary frame small enough to eyeball or diff between corpus
  * versions.
  *
  * Everything reduces in a single aggregation pass over the corpus
  * (map-combined; the shuffle carries |sources| rows), with the exact-dup
  * rate from one extra fingerprint aggregation. No driver-side data paths.
  */
object Curation {

  /** Per-`sourceCol` corpus summary:
    * docs, total/mean tokens, mean quality score, Gopher pass rate,
    * mean token entropy, mean surprisal proxy (distinct-token ratio),
    * exact-duplicate rate (1 − distinct fingerprints / docs).
    *
    * `gopherMinWords`/`gopherMinStopwords`/`gopherMinAlphaFrac` relax the
    * document filter for short-doc corpora (defaults mirror
    * [[TextFunctions.gopherPass]]). */
  def report(docs: DataFrame, sourceCol: String, textCol: String,
      gopherMinWords: Long = 50L, gopherMinStopwords: Long = 2L,
      gopherMinAlphaFrac: Double = 0.8, scale: Int = 4): DataFrame = {
    val text = col(textCol)
    val enriched = docs.select(
      col(sourceCol).as("source"),
      TextFunctions.tokenCount(text).as("_toks"),
      TextFunctions.qualityScore(text).as("_q"),
      TextFunctions.gopherPass(text, minWords = gopherMinWords,
        minStopwords = gopherMinStopwords,
        minAlphaFrac = gopherMinAlphaFrac).cast("double").as("_gopher"),
      TextFunctions.tokenEntropy(text).as("_h"),
      TextFunctions.distinctTokenRatio(text).as("_dtr"),
      TextFunctions.fingerprint(text).as("_fp"))
    enriched.groupBy(col("source")).agg(
      count(lit(1)).as("docs"),
      sum(col("_toks")).as("total_tokens"),
      round(avg(col("_toks")), scale).as("mean_tokens"),
      round(avg(col("_q")), scale).as("mean_quality"),
      round(avg(col("_gopher")), scale).as("gopher_pass_rate"),
      round(avg(col("_h")), scale).as("mean_token_entropy"),
      round(avg(col("_dtr")), scale).as("mean_distinct_token_ratio"),
      round(lit(1.0) - countDistinct(col("_fp")).cast("double")
        / count(lit(1)).cast("double"), scale).as("exact_dup_rate"))
  }

  /** Quality-filter ablation matrix: one row per OBSERVED combination of
    * filter verdicts with its document count — the tuning artifact behind
    * "which filters overlap, which do unique work, what would relaxing one
    * cost". Marginals (docs a filter removes), unique removals (docs ONLY
    * it removes — the filter-combination row with exactly that flag set),
    * and survivor count (the all-false row) all read directly off the
    * matrix, so one corpus pass answers every single-filter ablation.
    *
    * Scale shape: the verdict bitmap is computed map-side; the aggregation
    * groups on ≤ 2^|filters| combinations (filters are few by nature), so
    * the shuffle is combination-sized regardless of corpus size. Null
    * verdicts count as false (filter did not flag).
    */
  def filterAblation(docs: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "at least one filter")
    require(filters.map(_._1).distinct.size == filters.size, "duplicate filter names")
    docs
      .select(filters.map { case (n, c) => coalesce(c, lit(false)).as(n) }: _*)
      .groupBy(filters.map(f => col(f._1)): _*)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_flagged",
        filters.map(f => col(f._1).cast("int")).reduce(_ + _).cast("long"))
  }
}
