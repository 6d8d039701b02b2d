package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partitioning and not reproducible
  * across engines or re-partitions; these operators decide membership from a
  * content hash, so a sample is stable under re-runs, repartitioning, engine
  * swaps and incremental reprocessing (the property data pipelines actually
  * need: "the same document is always in or always out").
  *
  * Hashing is md5-based (top 60 bits) so membership is recomputable by any
  * SQL engine for verification. Pure map-side — no shuffle, no state.
  */
object Sampling {

  /** 60-bit hash bucket in [0, buckets) of a key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep a stable ~`rate` fraction of rows, decided by the key's hash. */
  def hashSample(df: DataFrame, key: Column, rate: Double,
      buckets: Int = 10000): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.where(hashBucket(key, buckets) < lit(math.round(rate * buckets)))
  }

  /** Stratified deterministic sampling: a rate per stratum value (e.g.
    * downsample dominant languages, keep the tail). Strata missing from
    * `rates` use `defaultRate`. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double,
      buckets: Int = 10000): DataFrame = {
    val threshold = rates.foldLeft(lit(math.round(defaultRate * buckets))) {
      case (acc, (value, rate)) =>
        when(stratum === lit(value), lit(math.round(rate * buckets))).otherwise(acc)
    }
    df.where(hashBucket(key, buckets) < threshold)
  }
}
