package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch preparation: lay documents out in
  * a deterministic token stream and assign each one the fixed-size training
  * window ("chunk") its first token lands in — the concat-and-split packing
  * every LLM data pipeline runs before tokenised shards are written.
  *
  * Scale shape: offsets are a running sum over a window, so packing is
  * per-SHARD (the `shardCols` partitioning — language, source, bucket...).
  * An unsharded global cumsum would serialise 100 TB through one reducer;
  * sharded, each stream packs independently in one window shuffle, which is
  * also what downstream training wants (homogeneous shards, stable order).
  */
object Packing {

  /** Assign stream offsets and chunk ids.
    *
    * @param tokenCol   per-doc token count (precomputed or
    *                   [[graft.functions.TextFunctions.tokenCount]])
    * @param orderCol   total order within a shard (doc id)
    * @param windowTokens chunk capacity in tokens
    * @return input keys + `n_tokens`, `start_offset` (tokens before this doc
    *         in its shard's stream), `chunk_id` (window of the first token),
    *         `spans_boundary` (doc crosses into the next window — the
    *         fraction of such docs measures packing fragmentation).
    */
  def packSequences(
      docs: DataFrame,
      shardCols: Seq[Column],
      orderCol: Column,
      tokenCol: Column,
      windowTokens: Long): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    val w = Window.partitionBy(shardCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val endOffset = sum(tokenCol).over(w) // inclusive running total
    docs
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("start_offset", (endOffset - tokenCol).cast("long"))
      .withColumn("chunk_id", floor(col("start_offset") / lit(windowTokens)))
      .withColumn("spans_boundary",
        col("start_offset") % lit(windowTokens) + col("n_tokens") > lit(windowTokens))
  }
}
