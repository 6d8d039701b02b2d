package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: versioned history rows with
  * `valid_from` / `valid_to` / `is_current` / `version`.
  *
  * The reference's audit tables keep full append history and resolve the
  * latest row per key at snapshot time (SURVEY.md §2.7); SCD2 is the
  * complementary warehouse shape — intervals instead of point-in-time
  * resolution — and the natural output of its RDBM temporal ingestion.
  *
  * Everything is expressed over ONE window partitioning (the business key,
  * ordered by event time + tie-break): the run-compression lag, the
  * interval lead and the version row_number all reuse the same shuffle and
  * sort, so history building costs a single exchange regardless of how many
  * columns are tracked. At 100 TB that matters more than anything else —
  * the alternative MERGE-per-batch pattern shuffles the whole dimension
  * once per ingested batch.
  */
object Scd {

  /** Build an SCD2 history from a change log.
    *
    * Each input row is an observation of the tracked attributes at `tsCol`.
    * Consecutive observations (per key, ordered by `tsCol` then `tieBreak`)
    * with identical tracked values are compressed into one interval.
    * Comparison is null-safe: a tracked column flipping to/from null opens
    * a new version.
    *
    * Output = key columns + tracked columns +
    * `valid_from` (observation ts), `valid_to` (next version's ts, null for
    * the open interval), `is_current`, `version` (1-based per key).
    */
  def scd2FromChanges(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      trackedCols: Seq[String],
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(trackedCols.nonEmpty, "trackedCols must be non-empty")

    val ordering: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)

    val state = struct(trackedCols.map(col): _*)
    // run compression: keep only rows whose tracked state differs (null-safe)
    // from the previous observation
    val changePoints = changes
      .withColumn("_prev_state", lag(state, 1).over(w))
      .where(col("_prev_state").isNull || !(state <=> col("_prev_state")))
      .drop("_prev_state")

    // filter preserves the (key, ordering) sort, so lead/row_number reuse
    // the same exchange+sort instead of shuffling again
    changePoints
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w).cast("long"))
      .select((keys ++ trackedCols ++
        Seq("valid_from", "valid_to", "is_current", "version")).map(col): _*)
  }

  /** Merge a batch of new observations into an existing SCD2 dimension.
    *
    * Every dimension row re-enters as its opening observation
    * (`valid_from`), the batch is unioned in, and the history is rebuilt —
    * which makes the merge ORDER-INSENSITIVE: late/retroactive observations
    * splice into the correct position instead of corrupting the tail, and
    * re-delivering an already-seen observation is a no-op (run compression
    * absorbs it). `updates` must carry the key, tracked and ts columns.
    *
    * One caveat, inherent to storing compressed history: run compression
    * discards re-confirmations (a second observation of the SAME state
    * inside a run), so a retroactive DIFFERENT-state observation landing
    * inside an already-compressed run splits the run but cannot resurrect
    * a discarded later re-confirmation — the run's tail stays with the
    * retro state. In-order delivery (each batch newer than the dimension's
    * horizon) is always exactly one-shot-equivalent
    * (ScdPropertySpec verifies every cut point on random logs); keep raw
    * change logs (e.g. in an audit table) if fully out-of-order rebuilds
    * must be lossless.
    */
  def scd2Merge(
      dim: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      tsCol: String,
      trackedCols: Seq[String],
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    // dim rows re-enter without their original change-log columns, so a
    // tie-break must be something the dimension still carries
    require(tieBreak.forall(c => keys.contains(c) || trackedCols.contains(c)),
      "scd2Merge tieBreak columns must be key or tracked columns " +
        "(the dimension no longer carries other change-log columns)")
    val obsCols = (keys ++ trackedCols ++ (tsCol +: tieBreak)).distinct
    val reopened = dim
      .withColumn(tsCol, col("valid_from"))
      .select(obsCols.map(col): _*)
    val incoming = updates.select(obsCols.map(col): _*)
    scd2FromChanges(reopened.unionByName(incoming), keys, tsCol, trackedCols, tieBreak)
  }

  /** Change-data-capture diff of two keyed snapshots: classify every key as
    * `added` (only in `after`), `removed` (only in `before`) or `changed`
    * (in both, any compared column differs — null-safe). Unchanged keys are
    * dropped: a CDC feed carries deltas, not the full table.
    *
    * Scale shape: ONE full outer join shuffled on the primary key — the
    * minimal work for a diff — with old/new values carried side by side so
    * downstream apply/merge steps don't re-join. Comparison is null-safe
    * `<=>` per column (a value appearing or disappearing IS a change).
    *
    * @return key columns + `change_type` + `<col>_before`/`<col>_after`
    *         for each compared column.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compared column")
    require(keys.intersect(compareCols).isEmpty,
      s"key and compare columns overlap: ${keys.intersect(compareCols).mkString(", ")}")
    val b = before.select((keys ++ compareCols).map(col): _*)
      .withColumn("_graft_b", lit(1))
    val a = after.select((keys ++ compareCols).map(col): _*)
      .withColumn("_graft_a", lit(1))
    val bAliased = compareCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"${c}_before"))
    val aAliased = compareCols.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"${c}_after"))
    val joined = bAliased.join(aAliased, keys, "full_outer")
    val anyDiff = compareCols
      .map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("_graft_b").isNull, "added")
          .when(col("_graft_a").isNull, "removed")
          .when(anyDiff, "changed"))
      .where(col("change_type").isNotNull)
      .drop("_graft_b", "_graft_a")
  }
}
