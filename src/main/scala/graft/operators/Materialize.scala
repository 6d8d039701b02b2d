package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager materialization point for operators that reuse an intermediate
  * across branches or iterations.
  *
  * Two modes, chosen by `spark.graft.materialize.mode`:
  *
  *  - `localCheckpoint` (default): cuts lineage and stores blocks on the
  *    executors; blocks are reclaimed when the frame is garbage collected,
  *    so nothing leaks in long sessions. Trade-off: blocks are NOT
  *    recomputable — an executor loss mid-pipeline fails the job. Right for
  *    local mode, static allocation, and short pipelines.
  *  - `persist`: replicated MEMORY_AND_DISK_2 persist, forced eagerly.
  *    Survives single-executor loss (replica) and anything worse (lineage
  *    recompute). Right for long-running clusters with dynamic allocation.
  *    Trade-off: lineage is retained (plans grow across iterations) and the
  *    cache entry lives until evicted or the session ends.
  */
private[graft] object Materialize {

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.materialize.mode") match {
      case Some("persist") =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // force now: reused branches must not race the first fill
        p
      case _ => df.localCheckpoint(true)
    }

  /** Drop a materialization produced by [[apply]] once superseded.
    * Iterative operators MUST call this on each round's predecessor in
    * persist mode or replicated cache entries accumulate per iteration;
    * no-op in localCheckpoint mode (blocks free on GC). */
  def release(df: DataFrame): Unit =
    if (df.sparkSession.conf.getOption("spark.graft.materialize.mode").contains("persist"))
      df.unpersist()
}
