package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and interval
  * (range) join. Composed from public DataFrame ops so Catalyst keeps
  * optimizing around them; both are single-keyed-shuffle plans that survive a
  * 1000× scale-up — never a per-row driver loop, never an unbounded
  * cross-product.
  *
  * The reference delegates all joins to user Spark code
  * (/root/reference/waimak-core/.../dataflow/spark/package.scala:68-311);
  * these fill the gap for event-time pipelines at training-data scale.
  */
object Temporal {

  /** Backward as-of join: each left row picks the single most recent right
    * row with the same key and `rightTs <= leftTs` (LEFT-outer semantics:
    * unmatched left rows keep null payloads).
    *
    * Implementation is the union-and-carry-forward trick: tag both sides,
    * union, one window over (key) ordered by (ts, side) carrying the last
    * non-null right payload forward. ONE shuffle on the key, no join
    * explosion on skewed keys, no per-key driver state — the scale-correct
    * plan for "attach latest dimension state to each event".
    *
    * Right rows must be unique per (key, rightTs) for deterministic output —
    * pre-dedupe with a row_number window if needed.
    *
    * @param payloadCols right columns to attach (must not collide with left
    *                    column names)
    * @param strict      if true, match only `rightTs < leftTs` (exclusive)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns collide with left columns: ${payloadCols.intersect(leftCols).mkString(", ")}")

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(right.select(payloadCols.map(col): _*).schema).as("__p")): _*)
    // null-timestamp or null-key right rows can never match: SQL ASOF joins
    // nothing on null comparisons, but the window would happily group null
    // keys together and carry their payloads. Left rows with null keys/ts
    // stay, with null payloads (left-outer semantics).
    val r = right
      .where(keyCols.map(col(_).isNotNull).foldLeft(col(rightTs).isNotNull)(_ && _))
      .select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        struct(payloadCols.map(col): _*).as("__p")): _*)

    // at equal ts: inclusive ⇒ right (0) sorts before left (1) and is
    // visible; strict ⇒ right sorts after left and is not
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c")) ++
        payloadCols.map(c => col(s"__m.$c")): _*)
  }

  /** Interval (range) join: each point row pairs with every interval row
    * whose `[startCol, endCol)` half-open range contains `pointTs`. No equi
    * key required.
    *
    * Scale path: intervals explode to the fixed-width time buckets they
    * cover, points map to their single bucket, and the pairing becomes an
    * equi-join on the bucket id — work proportional to interval span /
    * `bucketWidth`, never |points| × |intervals|. Each (point, interval)
    * pair meets in exactly one bucket (the point's), so no dedup pass is
    * needed. Pick `bucketWidth` near the typical interval length: too small
    * explodes intervals into many buckets, too large packs unrelated rows
    * into one bucket.
    *
    * @param bucketWidth bucket size as a Spark SQL interval-seconds count
    */
  def intervalJoin(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long = 86400L): DataFrame = {
    val widthUs = bucketWidthSec * 1000000L
    val p = points.withColumn("__bucket", (unix_micros(col(pointTs)) / widthUs).cast("long"))
    // degenerate intervals (end <= start, or null bounds) match nothing —
    // without the guard, sequence() would silently COUNT DOWN across the
    // whole bucket range for an inverted interval and explode the join
    val i = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          (unix_micros(col(startCol)) / widthUs).cast("long"),
          // end is exclusive: a range ending exactly on a bucket boundary
          // does not reach into that bucket
          ((unix_micros(col(endCol)) - 1) / widthUs).cast("long"))))
    p.join(i, Seq("__bucket"))
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bucket")
  }

  /** Funnel analysis: per key, the timestamp of the first occurrence of
    * each stage STRICTLY AFTER the previous stage's first occurrence — the
    * ordered-progression primitive (signup → activation → purchase). A
    * stage reached twice counts once; an out-of-order event (purchase
    * before signup) does not satisfy a later stage.
    *
    * Scale shape: one keyed aggregation per stage (conditional min), each
    * joined back on the key — k small and fixed, every shuffle keyed by
    * `keyCol`, so co-partitioning makes the joins cheap after the first.
    * Output: keyCol, `t_<stage>` per stage (null once progression stops)
    * and `stages_reached`. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size, "duplicate funnel stages")
    val ev = events.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(typeCol).as("__tp"))
    val firstStage = ev.groupBy(col("__k"))
      .agg(min(when(col("__tp") === stages.head, col("__ts")))
        .as(s"t_${stages.head}"))
    val full = stages.sliding(2).foldLeft(firstStage) {
      case (acc, Seq(prev, stage)) =>
        // carry previous stage times through (constant per key)
        val aggCols = acc.columns.filter(_ != "__k")
          .map(c => first(col(c)).as(c)).toSeq :+
          min(when(col("__tp") === stage &&
            col("__ts") > col(s"t_$prev"), col("__ts"))).as(s"t_$stage")
        ev.join(acc, Seq("__k"))
          .groupBy(col("__k"))
          .agg(aggCols.head, aggCols.tail: _*)
      case (acc, _) => acc
    }
    val reached = stages.map(s => when(col(s"t_$s").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumnRenamed("__k", keyCol)
      .withColumn("stages_reached", reached)
  }

  /** Trailing-window anomaly detection: per key, flag a point whose value
    * deviates more than `zThreshold` sample standard deviations from the
    * mean of the PRIOR points inside `windowSec` seconds before it — the
    * monitoring primitive for metric streams (one keyed window shuffle; no
    * self-join, no collect).
    *
    * Prior-window stats come from a RANGE frame ending at the current row
    * with the row's own contribution subtracted out, so ties on the
    * timestamp (frame peers) are handled identically by any engine that
    * implements SQL RANGE frames. Variance uses the explicit
    * (Σx² − n·mean²)/(n−1) form — the same arithmetic an oracle can write —
    * rather than an engine-specific streaming estimator, and the mean/z
    * round before thresholding so boundary decisions are reproducible.
    * Rows with fewer than `minPrior` prior points are never flagged
    * (cold-start guard).
    *
    * Output: input columns plus `n_prior`, `mean_prior`, `z` (null when
    * undefined) and `is_anomaly`. */
  def rollingZScore(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      windowSec: Long,
      minPrior: Int = 5,
      zThreshold: Double = 3.0,
      scale: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowSec > 0, s"windowSec must be > 0, got $windowSec")
    val widthUs = windowSec * 1000000L
    val v = col(valueCol).cast("double")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-widthUs, 0)
    // null-valued rows contribute nothing to the frame aggregates, so only
    // subtract the row's own contribution when it has one
    val self = when(v.isNotNull, lit(1L)).otherwise(lit(0L))
    val withSums = df
      .withColumn("__n", count(v).over(w) - self)
      .withColumn("__sum", sum(v).over(w) - coalesce(v, lit(0.0)))
      .withColumn("__sumsq", sum(v * v).over(w) - coalesce(v * v, lit(0.0)))
    // structurally non-zero denominators, NOT when-guards around the
    // division: codegen's subexpression elimination hoists a subexpression
    // shared by several output columns (mean feeds both mean_prior and z)
    // out of its conditional branches, and under ANSI mode the eagerly
    // evaluated 0/0 of a no-prior-rows row throws DIVIDE_BY_ZERO. The
    // when-guards below still decide which rows get a value; greatest()
    // only keeps the unused arithmetic finite
    val mean = col("__sum") / greatest(col("__n"), lit(1L))
    val variance = (col("__sumsq") - col("__n") * mean * mean) /
      greatest(col("__n") - 1, lit(1L))
    // max(var, 0): the subtraction form can go epsilon-negative on
    // near-constant windows, and sqrt(-0.0001) would null the z of exactly
    // the rows most worth flagging
    val std = sqrt(greatest(variance, lit(0.0)))
    val z = when(col("__n") >= minPrior && std > lit(1e-9),
      round((v - mean) / greatest(std, lit(1e-12)), scale))
    withSums
      .withColumn("n_prior", col("__n").cast("long"))
      .withColumn("mean_prior",
        when(col("__n") >= 1, round(mean, scale)))
      .withColumn("z", z)
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > lit(zThreshold), lit(false)))
      .drop("__n", "__sum", "__sumsq")
  }

  /** LOCF (last-observation-carried-forward) resampling onto a regular,
    * epoch-aligned time grid: for each key, one row per tick of width
    * `intervalSec` between the key's first and last observation, carrying
    * the most recent observation at or before the tick — the "event log →
    * regular time series" primitive behind feature snapshots, dashboards
    * and drift series.
    *
    * Ticks are aligned to the epoch grid (first tick = the observation
    * span's start rounded UP to a multiple of `intervalSec`), so series
    * from different keys share tick instants and can be compared/joined
    * directly. A key whose span contains no aligned tick emits nothing.
    *
    * Scale shape: tick generation is distributive — a per-key min/max
    * aggregate plus `sequence()` (never a driver loop) — and the match runs
    * through the NATIVE as-of join ([[graft.plans.AsOf]]): the observation
    * log shuffles/sorts once per key; the grid (tiny next to the log)
    * broadcasts or co-shuffles by the join's regime. Every tick ≥ its
    * key's first observation, so the join is total (no null carries).
    *
    * Observations must be unique per (key, ts) for deterministic output —
    * pre-aggregate duplicates first (same contract as [[asofJoin]]).
    *
    * Output: keyCols, `tick`, `obs_ts` (matched observation's timestamp),
    * `valueCol` (its value). */
  def resampleLocf(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, intervalSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "resampleLocf needs at least one key column")
    require(intervalSec > 0, s"intervalSec must be > 0, got $intervalSec")
    val ivUs = intervalSec * 1000000L
    // ceil to the next grid multiple via pmod (mathematical modulus):
    // x + ((-x) mod iv). The (x + iv - 1) div iv form is WRONG for
    // pre-1970 timestamps — Spark's div truncates toward zero, not floor —
    // while pmod is sign-safe exact integer math (matches the oracle's
    // floor-div `//` form and the streaming twin's floorDiv)
    val firstTick = timestamp_micros(
      expr(s"unix_micros(__min) + pmod(-unix_micros(__min), $ivUs)"))
    val grid = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol)).as("__min"), max(col(tsCol)).as("__max"))
      .withColumn("__first", firstTick)
      .where(col("__first") <= col("__max")) // span too short for any tick
      .select(keyCols.map(col) :+ explode(sequence(col("__first"),
        col("__max"), expr(s"INTERVAL $intervalSec SECONDS"))).as("tick"): _*)
    // rename the observation side so the as-of output has no ambiguity
    val rKeys = keyCols.map(k => s"__r_$k")
    val obs = df.select(keyCols.zip(rKeys).map { case (k, r) => col(k).as(r) }
      ++ Seq(col(tsCol).as("obs_ts"), col(valueCol).as("__v")): _*)
    graft.plans.AsOf.asOfJoin(grid, obs, keyCols, rKeys, "tick", "obs_ts")
      .select(keyCols.map(col) ++
        Seq(col("tick"), col("obs_ts"), col("__v").as(valueCol)): _*)
  }
}
