package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — the numeric data-quality twin of
  * the text quality filters: flag rows whose value sits far from its
  * group's median in MAD units (robust z-score, Iglewicz–Hoaglin). Median
  * and MAD shrug off the very outliers a mean/stddev rule would absorb.
  *
  * Scale shape: two aggregation passes over the data (exact medians need
  * one, MADs need a second with the medians attached) reducing to a
  * GROUP-sized relation each time; both stat relations broadcast back, so
  * flagging is a map-side expression, and the data itself never shuffles.
  * With a group count near the row count this degrades to ordinary keyed
  * aggregation — the broadcast assumption is |groups| ≪ |rows|.
  */
object Outliers {

  /** 1 / Φ⁻¹(3/4): scales MAD to estimate σ under normality. */
  val MadSigma = 1.4826

  /** Flag rows with robust z = |x − median| / (MadSigma · MAD) > k.
    *
    * Groups where MAD = 0 (over half the values identical) yield a null
    * z-score and `outlier = false` — a constant group has no scale to
    * measure deviation in, and inf/NaN must not leak into comparisons.
    * Null values are never outliers (their z is null).
    *
    * @return input columns + `robust_z` (rounded to `scale`), `outlier`.
    */
  def robustZ(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 3.5, scale: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    // null-safe joins throughout: groupBy treats null as a group of its own,
    // and an equi-join back on the group key would silently drop that
    // group's rows from the output (the same nullable-key trap the sampling
    // operators guard against)
    def joinStats(base: DataFrame, stats: DataFrame): DataFrame = {
      val statsR = groupCols.foldLeft(stats)((d, c) => d.withColumnRenamed(c, s"_g_$c"))
      val cond = groupCols.map(c => base(c) <=> statsR(s"_g_$c")).reduce(_ && _)
      base.join(broadcast(statsR), cond).drop(groupCols.map(c => s"_g_$c"): _*)
    }
    val med = df.groupBy(gcols: _*)
      .agg(expr(s"percentile(${quote(valueCol)}, 0.5)").as("_graft_med"))
    val mad = joinStats(df, med)
      .groupBy(gcols: _*)
      .agg(expr(s"percentile(abs(${quote(valueCol)} - _graft_med), 0.5)")
        .as("_graft_mad"))
    val z = when(col("_graft_mad") === 0.0, lit(null).cast("double"))
      .otherwise(round(abs(v - col("_graft_med")) / (lit(MadSigma) * col("_graft_mad")), scale))
    joinStats(joinStats(df, med), mad)
      .withColumn("robust_z", z)
      .withColumn("outlier", coalesce(col("robust_z") > k, lit(false)))
      .drop("_graft_med", "_graft_mad")
  }

  /** Winsorize: clip `valueCol` to its per-group [pLo, pHi] exact
    * percentiles — the standard tail-taming step before training on noisy
    * numeric features (clip, don't drop: row count and joins stay intact).
    *
    * Same scale shape as [[robustZ]]: one aggregation reduces the bounds
    * to a GROUP-sized relation, which broadcasts back so clipping is a
    * map-side expression; the data never shuffles. Output: input columns
    * plus `<valueCol>_w` (clipped, rounded to `scale`) and `clipped`.
    * Null values pass through unclipped (`clipped = false`). */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99, scale: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    // bounds are rounded to the OUTPUT scale: the clip predicate then agrees
    // in precision with the emitted value, and the last-ulp float difference
    // between engines' interpolation algebra ((1-f)a+fb vs a+f(b-a)) — which
    // flipped boundary-tied rows at sf1 — is pinned away
    val bounds = df.groupBy(gcols: _*)
      .agg(round(expr(s"percentile(${quote(valueCol)}, $pLo)"), scale).as("_graft_lo"),
        round(expr(s"percentile(${quote(valueCol)}, $pHi)"), scale).as("_graft_hi"))
    val statsR = groupCols.foldLeft(bounds)((d, c) => d.withColumnRenamed(c, s"_g_$c"))
    val cond = groupCols.map(c => df(c) <=> statsR(s"_g_$c")).reduce(_ && _)
    df.join(broadcast(statsR), cond)
      .drop(groupCols.map(c => s"_g_$c"): _*)
      // explicit null passthrough: Spark's greatest/least SKIP nulls, so
      // a null value would otherwise silently "clip" to the lower bound
      .withColumn(s"${valueCol}_w",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(round(least(greatest(v, col("_graft_lo")), col("_graft_hi")), scale)))
      .withColumn("clipped",
        coalesce(v < col("_graft_lo") || v > col("_graft_hi"), lit(false)))
      .drop("_graft_lo", "_graft_hi")
  }

  private def quote(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
