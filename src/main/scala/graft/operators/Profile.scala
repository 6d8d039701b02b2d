package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: the summary statistics a data platform shows
  * for every landed table (row count, null counts, exact distincts, value
  * ranges), complementing the assertion-style checks in
  * [[graft.dataquality.PrefabChecks]].
  *
  * All metrics for all requested columns reduce in a SINGLE aggregation
  * pass over the data. Multiple exact count-distincts compile to one
  * Expand-based aggregate (rows multiply by |columns| in-flight but the
  * input is still scanned once); for quick profiles of very wide tables at
  * 100 TB prefer `approxDistinct = true`, which replaces the Expand with
  * one HLL sketch per column — constant state, no row multiplication.
  */
object Profile {

  /** Profile `columns` of `df` → one row per column:
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).
    * min/max are rendered as strings so heterogeneous column types stack
    * into one frame; numeric columns keep their natural ordering for the
    * min/max COMPUTATION (the cast happens after the aggregate). */
  def profile(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = columns
      .map(c => s"'$c', __cnt_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    row
      .selectExpr("__total",
        s"stack(${columns.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_value, max_value)")
      .select(col("col_name"), col("__total").as("n_rows"),
        (col("__total") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
