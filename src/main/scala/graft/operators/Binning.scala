package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth (quantile) binning — the feature-engineering primitive for
  * skew-robust bucketing (each bin holds ~the same row count regardless of
  * the value distribution, unlike equi-width `width_bucket`).
  *
  * Scale shape: the N-1 boundary quantiles reduce to the driver in ONE
  * aggregation (state is bounded by the exact-percentile buffer, never
  * row count on the driver), then assignment is a pure map-side comparison
  * chain against literals — no window over a global ordering (an `ntile`
  * formulation would serialise the corpus through one sort partition).
  * Boundaries are rounded so a SQL oracle reproduces the identical bins.
  */
object Binning {

  /** Exact equi-depth boundaries: the i/nBins percentiles, i in [1, nBins). */
  def equiDepthBoundaries(df: DataFrame, valueCol: String, nBins: Int,
      scale: Int = 6): Seq[Double] = {
    require(nBins > 1, s"nBins must be > 1, got $nBins")
    val fracs = (1 until nBins).map(i => i.toDouble / nBins)
    // backtick-quote: legal column names with dots/spaces must not be
    // parsed as field paths or spliced as SQL
    val q = "`" + valueCol.replace("`", "``") + "`"
    val arr = df.select(
      expr(s"percentile($q, array(${fracs.mkString(",")}))")).head()
      .getSeq[Double](0)
    require(arr != null,
      s"equiDepth over an empty (or all-null '$valueCol') input")
    arr.map(b => BigDecimal(b).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble)
  }

  /** Bin id in [0, nBins): the count of boundaries strictly below the
    * value (ties sit in the LOWER bin; nulls get bin null). */
  def binColumn(value: Column, boundaries: Seq[Double]): Column =
    boundaries.map(b => when(value > lit(b), 1L).otherwise(0L))
      .reduce(_ + _)

  /** Append an equi-depth `bin` column over `valueCol`. */
  def equiDepth(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String = "bin", scale: Int = 6): DataFrame = {
    require(!df.columns.contains(binCol),
      s"input already carries '$binCol' — pass a different binCol")
    df.withColumn(binCol,
      binColumn(col(valueCol), equiDepthBoundaries(df, valueCol, nBins, scale)))
  }
}
