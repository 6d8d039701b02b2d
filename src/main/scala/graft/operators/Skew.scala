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

  // the salted native joins would silently overwrite-then-drop a user
  // column named like the internal salt — reject, as packSequences does
  // for its reserved output names
  private def requireNoSaltColumns(left: DataFrame, right: DataFrame): Unit = {
    val reserved = Seq("_gsalt", "_gsalt_r")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"input already carries ${clash.mkString(", ")} — rename it (the " +
        "salted join uses these internally and would drop it)")
  }

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

  /** As-of left join with a skew-salted fact side, composing with the
    * NATIVE as-of exec ([[graft.plans.AsOf.asOfJoin]]).
    *
    * The regime map for a hot key at scale: when the right side is
    * dimension-sized, [[graft.plans.AsOfJoinStrategy]]'s broadcast regime
    * is the escape hatch (the fact side never shuffles, so the hot key
    * stays spread across its scan partitions). This operator covers the
    * remaining corner — fact × fact, BOTH sides too big to broadcast, one
    * key dominating the shuffle: AQE's runtime skew split rewrites only
    * Spark's own SortMergeJoin, never a custom exec, so without help the
    * hot key serializes through ONE merge task. The salt spreads it:
    * left rows get a content-derived salt in [0, saltBuckets) (see
    * [[contentSalt]] for why content, not position), the right side
    * replicates once per salt value, and the native join clusters on
    * (key, salt). Per (key, salt) partition the right rows of the key are
    * COMPLETE — a full replica — so each left row's as-of winner is
    * exactly the unsalted one, and left-outer multiplicity is preserved
    * (every left row lives in exactly one salt). Cost: the right side
    * shuffles saltBuckets times over — the standard salting trade; size
    * the bucket count to the hot key's excess, not the cluster.
    *
    * The default salt derives from FULL row content ([[contentSalt]]), so
    * FULLY-IDENTICAL duplicate left rows share one bucket — and unlike
    * the plain [[saltedJoin]], there is no AQE skew-split fallback behind
    * a custom exec to absorb that residue. If the hot key is
    * identical-duplicate-heavy, dedup/pre-aggregate it first, or pass
    * `saltOn` (e.g. a unique id column) to spread the salt on columns
    * that do vary — still deterministic under stage retry as long as the
    * chosen columns are row content, not position. */
  def saltedAsOfJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: String = "backward", tolerance: Option[Long] = None,
      saltBuckets: Int = 16, saltOn: Seq[Column] = Seq.empty): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    requireNoSaltColumns(skewedLeft, right)
    val salt = if (saltOn.isEmpty) contentSalt(skewedLeft, saltBuckets)
      else pmod(xxhash64(saltOn: _*), lit(saltBuckets.toLong)).cast("int")
    val salted = skewedLeft.withColumn("_gsalt", salt)
    val replicated = right.withColumn("_gsalt_r",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    graft.plans.AsOf.asOfJoin(salted, replicated,
        leftKeys :+ "_gsalt", rightKeys :+ "_gsalt_r",
        leftTimeCol, rightTimeCol, direction, tolerance,
        // salting is definitionally the sort-merge regime: a right side
        // small enough to broadcast should use the broadcast regime
        // instead of salting at all
        broadcastRight = Some(false))
      .drop("_gsalt", "_gsalt_r")
  }

  /** Keyed interval inner join with a skew-salted point side — the
    * [[saltedAsOfJoin]] construction applied to
    * [[graft.plans.IntervalJoin.intervalJoin]]: points salt by content,
    * intervals replicate per salt, the native exec clusters on
    * (key, salt). Each point meets every containing interval of its key
    * exactly once (in its own salt's replica), so the pair multiset is
    * the unsalted one. */
  def saltedIntervalJoin(
      skewedPoints: DataFrame,
      intervals: DataFrame,
      pointKeys: Seq[String], intervalKeys: Seq[String],
      timeCol: String, startCol: String, endCol: String,
      saltBuckets: Int = 16, saltOn: Seq[Column] = Seq.empty): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    requireNoSaltColumns(skewedPoints, intervals)
    val salt = if (saltOn.isEmpty) contentSalt(skewedPoints, saltBuckets)
      else pmod(xxhash64(saltOn: _*), lit(saltBuckets.toLong)).cast("int")
    val salted = skewedPoints.withColumn("_gsalt", salt)
    val replicated = intervals.withColumn("_gsalt_r",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    graft.plans.IntervalJoin.intervalJoin(salted, replicated,
        pointKeys :+ "_gsalt", intervalKeys :+ "_gsalt_r",
        timeCol, startCol, endCol, broadcastIntervals = Some(false))
      .drop("_gsalt", "_gsalt_r")
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
