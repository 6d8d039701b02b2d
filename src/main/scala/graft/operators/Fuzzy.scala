package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (approximate string) matching for record linkage / entity
  * resolution — the dedup step when keys are dirty strings rather than
  * stable ids.
  *
  * Candidate generation uses TOKEN BLOCKING: two strings are compared only
  * when they share at least one (lowercased, whitespace-split) token. That
  * turns the quadratic all-pairs comparison into an equi-join on the token,
  * so work follows token-bucket occupancy, not corpus². The token filter is
  * part of the operator's semantics (a pair sharing NO token is never
  * matched, whatever its edit distance) — the standard blocking trade-off,
  * stated rather than hidden.
  *
  * Scale: hot tokens (stopword-like) create quadratic buckets; cap them
  * with `maxTokenFreq` — blocking tokens occurring in more than that many
  * rows are dropped from candidate generation (pairs may still match via a
  * rarer shared token). At 100 TB set it so the biggest bucket stays ~10⁴.
  */
object Fuzzy {

  private def tokenized(df: DataFrame, idCol: String, strCol: String,
      side: String): DataFrame =
    df.select(col(idCol).as(s"id_$side"), col(strCol).as(s"name_$side"))
      .withColumn("tok",
        explode(array_distinct(split(lower(col(s"name_$side")), "\\s+"))))
      .where(length(col("tok")) > 0)

  private def capped(tok: DataFrame, maxTokenFreq: Option[Long]): DataFrame =
    maxTokenFreq match {
      case None => tok
      case Some(cap) =>
        val hot = tok.groupBy("tok").agg(count(lit(1)).as("n"))
          .where(col("n") > cap).select("tok")
        tok.join(broadcast(hot), Seq("tok"), "left_anti")
    }

  /** Near-duplicate pairs within one table: ids `id_a < id_b` whose strings
    * share a blocking token and have Levenshtein distance ≤ `maxDist`. */
  def fuzzyDupPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxTokenFreq: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val a = capped(tokenized(df, idCol, strCol, "a"), maxTokenFreq)
    val b = capped(tokenized(df, idCol, strCol, "b"), maxTokenFreq)
    a.join(b, Seq("tok"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Fuzzy left-right join: every (left, right) pair sharing a blocking
    * token with Levenshtein distance ≤ `maxDist`, plus the distance. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, leftStr: String, rightStr: String,
      maxDist: Int, maxTokenFreq: Option[Long] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val a = capped(tokenized(left, leftId, leftStr, "a"), maxTokenFreq)
    val b = capped(tokenized(right, rightId, rightStr, "b"), maxTokenFreq)
    a.join(b, Seq("tok"))
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select(col("id_a").as(leftId), col("id_b").as(rightId),
        col("dist").cast("long").as("dist"))
  }
}
