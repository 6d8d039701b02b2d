package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend fitting — the monitoring
  * primitive behind "is this quality metric drifting over time, per
  * segment?" on a continuously-ingested corpus.
  *
  * Everything reduces to six sufficient statistics per group
  * (n, Σx, Σy, Σx², Σy², Σxy), all map-combined sums: the shuffle carries
  * |groups| × 6 doubles regardless of corpus size, and the closed-form
  * slope/intercept/R² are computed from the aggregated row — no second
  * pass, no window, no driver state. This is the textbook example of an
  * algorithm that re-expresses as one `groupBy().agg()` and therefore
  * scales to any corpus the aggregation scales to.
  *
  * Numerical contract: the caller should CENTER x near the data (e.g.
  * days since the corpus epoch, not epoch-microseconds) — the closed form
  * computes n·Σx² − (Σx)², which cancels catastrophically when x carries a
  * large constant offset. With centered x the determinant is dominated by
  * genuine variance and the cross-engine float-sum-order difference is
  * absorbed by the output rounding.
  *
  * Degenerate groups (constant x, or fewer than 2 points) yield null
  * slope/intercept/R²; constant y with varying x yields slope 0 and null
  * R² (the R² ratio is 0/0 there).
  */
object Trend {

  /** OLS fit of `y` on `x` per group. Output: group columns plus
    * (n, slope, intercept, r2), each statistic rounded to `scale`. */
  def groupTrend(df: DataFrame, groups: Seq[Column], x: Column, y: Column,
      scale: Int = 6): DataFrame = {
    require(groups.nonEmpty, "groupTrend needs at least one group column")
    val xd = x.cast("double")
    val yd = y.cast("double")
    val agg = df.groupBy(groups: _*).agg(
      count(lit(1)).cast("long").as("n"),
      sum(xd).as("sx"), sum(yd).as("sy"),
      sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"),
      sum(xd * yd).as("sxy"))
    val n = col("n").cast("double")
    val det = n * col("sxx") - col("sx") * col("sx")
    val dety = n * col("syy") - col("sy") * col("sy")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val slope = cov / det
    agg.select(
      agg.columns.filterNot(Set("sx", "sy", "sxx", "syy", "sxy")).map(col).toSeq ++ Seq(
        round(when(det > 0, slope), scale).as("slope"),
        round(when(det > 0, (col("sy") - slope * col("sx")) / n), scale).as("intercept"),
        round(when(det > 0 && dety > 0, (cov * cov) / (det * dety)), scale).as("r2")): _*)
  }
}
