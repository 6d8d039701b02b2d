package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when one hot key dominates a shuffle so badly that even split
  * partitions overload, or when AQE is unavailable (streaming joins).
  *
  * Salted join: the skewed (large) side gets a random salt in [0, n); the
  * small side replicates n times, once per salt value; the join key becomes
  * (key, salt), spreading each hot key over n reducers. Correctness is
  * unchanged — every (key, salt) pair of the large side meets exactly one
  * replica of the small side's key.
  */
object Skew {

  /** Deterministic salt from the FULL row content. A positional id
    * (monotonically_increasing_id / round-robin) would spread identical
    * rows better, but its value depends on partition row order — a stage
    * retry after executor loss recomputes rows into DIFFERENT (key, salt)
    * reducers than the ones that already fetched old map output, silently
    * duplicating/dropping rows. On 1000-executor jobs retries are routine;
    * correctness wins. Fully-identical duplicate rows share a bucket —
    * residual in-bucket skew from that corner is what AQE's skew split
    * still handles. */
  private def contentSalt(df: DataFrame, buckets: Int) =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Inner equi-join with the left side treated as skewed. `saltBuckets`
    * bounds the replication of the right side. */
  def saltedJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      joinKeys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = skewedLeft.withColumn("_salt", contentSalt(skewedLeft, saltBuckets))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, joinKeys :+ "_salt")
      .drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Expressed for the common
    * count/sum shapes — each (aggExpr name -> (partial, merge)) pair. */
  def saltedCountSum(
      df: DataFrame,
      groupKeys: Seq[String],
      sumCols: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, saltBuckets))
    val partial = salted
      .groupBy((groupKeys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        sumCols.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    partial
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("_cnt")).as("n_rows"),
        sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")): _*)
  }
}
