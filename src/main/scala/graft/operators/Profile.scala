package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: the summary statistics a data platform shows for
  * every landed table (row count, null counts, exact distincts, value
  * ranges), complementing the assertion-style checks in
  * [[graft.dataquality.PrefabChecks]].
  *
  * Physical strategy (round 14 — the old one-pass Expand×k aggregate was
  * the suite's slowest sf1 row at 11.9s): the EXACT path runs one
  * single-distinct aggregate PER COLUMN and unions the k one-row results.
  * Each aggregate is a column-pruned scan feeding a two-phase
  * partial-dedup plan — no Expand row multiplication, no re-shuffle of
  * k× the input, and on a columnar source k single-column scans read the
  * same bytes one k-column scan would. A high-cardinality column (a PK at
  * 100 TB) pays exactly its own distinct shuffle, not k copies of every
  * row. The trade: an input that is itself an expensive COMPUTED frame
  * recomputes once per column — persist such inputs first (table scans,
  * the dominant profiling case, are free). `approxDistinct = true` keeps
  * the true one-pass shape: one HLL sketch per column in a single
  * aggregate — constant state, single scan, no Expand — the quick-profile
  * path for very wide tables.
  */
object Profile {

  /** Backtick-quote an arbitrary column name for Column resolution — names
    * with dots, spaces or quotes are legal in schemas and must not be
    * parsed as field paths (or worse, spliced into SQL text). */
  private def q(c: String) = "`" + c.replace("`", "``") + "`"

  /** Profile `columns` of `df` → one row per column:
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value).
    * min/max are rendered as strings so heterogeneous column types stack
    * into one frame; numeric columns keep their natural ordering for the
    * min/max COMPUTATION (the cast happens after the aggregate). */
  def profile(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    if (approxDistinct) {
      // one-pass HLL profile — internal aliases are index-based: immune to
      // whatever the user's column names contain
      val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(col(q(c))).as(s"__cnt_$i"),
          approx_count_distinct(col(q(c))).as(s"__nd_$i"),
          min(col(q(c))).cast("string").as(s"__min_$i"),
          max(col(q(c))).cast("string").as(s"__max_$i"))
      }
      val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
      // unpivot by exploding an array of per-column structs — pure Column
      // construction, no SQL-text splicing
      val entries = columns.zipWithIndex.map { case (c, i) =>
        struct(
          lit(c).as("col_name"),
          col(s"__cnt_$i").as("n_nonnull"),
          col(s"__nd_$i").cast("long").as("n_distinct"),
          col(s"__min_$i").as("min_value"),
          col(s"__max_$i").as("max_value"))
      }
      row
        .select(col("__total"), explode(array(entries: _*)).as("__e"))
        .select(col("__e.col_name").as("col_name"), col("__total").as("n_rows"),
          (col("__total") - col("__e.n_nonnull")).as("n_nulls"),
          col("__e.n_distinct").as("n_distinct"),
          col("__e.min_value").as("min_value"), col("__e.max_value").as("max_value"))
    } else {
      // exact path: one SINGLE-distinct aggregate per column, unioned.
      // The `__c` rename detaches the aggregate from the user's name before
      // any expression references it (same injection-immunity as above).
      columns.map { c =>
        df.select(col(q(c)).as("__c"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("__c")).as("__nonnull"),
            countDistinct(col("__c")).cast("long").as("n_distinct"),
            min(col("__c")).cast("string").as("min_value"),
            max(col("__c")).cast("string").as("max_value"))
          .select(lit(c).as("col_name"), col("n_rows"),
            (col("n_rows") - col("__nonnull")).as("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_ unionByName _)
    }
  }

  /** Pairwise Pearson correlations between numeric columns — the
    * feature-redundancy scan before training. ONE aggregation pass
    * computes every raw moment (k sums, k sums of squares, k·(k−1)/2
    * cross-products, map-combined), and r assembles from the explicit
    * formula r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)) —
    * the same arithmetic a SQL oracle writes, not an engine-specific
    * streaming estimator. The single stats row is the only thing that
    * reaches the driver (O(k²) doubles — bounded, never row-scaled).
    *
    * Rows with a null in ANY of `cols` are excluded (listwise deletion),
    * so every pair shares one n and one scan suffices. Constant columns
    * yield null r (zero variance has no direction). */
  def correlations(df: DataFrame, cols: Seq[String], scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate columns")
    val complete = df.na.drop(cols).select(cols.map(c => col(c).cast("double")): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("_n")) ++
        cols.map(c => sum(col(c)).as(s"_s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).as(s"_q_$c")) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"_x_${a}_$b") }
    val row = complete.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("_n").toDouble
    def d(name: String): Double = row.getAs[Double](name)
    val out = pairs.map { case (a, b) =>
      if (n == 0) (a, b, 0L, Option.empty[Double]) else {
      val num = n * d(s"_x_${a}_$b") - d(s"_s_$a") * d(s"_s_$b")
      val varA = n * d(s"_q_$a") - d(s"_s_$a") * d(s"_s_$a")
      val varB = n * d(s"_q_$b") - d(s"_s_$b") * d(s"_s_$b")
      val r =
        if (n < 2 || varA <= 0 || varB <= 0) None
        else Some(BigDecimal(num / (math.sqrt(varA) * math.sqrt(varB)))
          .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (a, b, n.toLong, r)
      }
    }
    import df.sparkSession.implicits._
    out.toDF("col_a", "col_b", "n", "corr")
  }

  /** Join/aggregation-key skew profile: the top-`topK` heaviest values of a
    * key column with each one's row count, share of the table, and skew
    * ratio versus the mean key occupancy (count ÷ (rows/distinct)). This is
    * the diagnosis an engineer runs BEFORE a 100 TB join melts one
    * executor: skew_ratio ≈ 1 everywhere → shuffle freely; a 10⁴× outlier →
    * salt that key, broadcast the other side, or lean on AQE skew-join.
    *
    * One map-combined count per key, one tiny rollup for the totals (a
    * 1-row broadcast), and a TakeOrdered for the top-K — nothing driver-
    * side beyond K rows. Nulls count as a real key (they hot-spot joins in
    * exactly the same way).
    * Output: (key_value string, n_rows, share, skew_ratio) by n_rows desc. */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 20,
      scale: Int = 6): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = df.groupBy(col(q(keyCol)).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__distinct"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", round(col("n_rows") / col("__total"), scale))
      .withColumn("skew_ratio",
        round(col("n_rows") * col("__distinct") / col("__total"), scale))
      .orderBy(col("n_rows").desc, col("key_value").asc)
      .limit(topK)
      .select(col("key_value"), col("n_rows"), col("share"), col("skew_ratio"))
  }
}
