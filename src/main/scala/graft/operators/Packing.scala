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
      windowTokens: Long,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    // an empty partitioning would serialise the whole corpus through ONE
    // reducer — the exact failure mode sharding exists to prevent
    require(shardCols.nonEmpty,
      "packSequences needs at least one shard column (a global token stream " +
        "cannot be packed distributedly; shard by language/source/bucket)")
    val reserved = Seq("n_tokens", "start_offset", "chunk_id", "spans_boundary")
    require(!docs.columns.exists(reserved.contains),
      s"input already carries one of ${reserved.mkString(", ")} — rename it " +
        "(packSequences would silently overwrite it)")
    // (orderCol, tieBreak) must totally order each shard — with ties the
    // ROWS-frame running sum is partitioning-dependent and shards stop
    // being reproducible. Null token counts pack as zero-length docs
    // (offsets stay defined for every row).
    val tok = coalesce(tokenCol.cast("long"), lit(0L))
    val w = Window.partitionBy(shardCols: _*).orderBy(orderCol +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val endOffset = sum(tok).over(w) // inclusive running total
    docs
      .withColumn("n_tokens", tok)
      .withColumn("start_offset", (endOffset - tok).cast("long"))
      .withColumn("chunk_id", floor(col("start_offset") / lit(windowTokens)))
      .withColumn("spans_boundary",
        col("start_offset") % lit(windowTokens) + col("n_tokens") > lit(windowTokens))
  }

  /** Length-bucketed batching — the PADDED-batch twin of [[packSequences]]:
    * group documents into fixed-count batches of SIMILAR token length, so a
    * batch padded to its longest member wastes as little compute as
    * possible (the dynamic-batching layout encoder-style training and
    * batched inference want, where packing into one stream isn't an
    * option).
    *
    * Within each shard, docs sort by (token count, tieBreak) and every
    * consecutive run of `batchSize` becomes one batch — the sorted-batching
    * heuristic that minimises Σ(batch_max − len) without a global
    * assignment problem. Scale shape: ONE window shuffle keyed by the shard
    * columns (same contract as packSequences: shards sort independently, a
    * global length sort would serialise the corpus), then a map-combined
    * per-batch aggregation.
    *
    * Output: shardCols + batch_idx, n_docs, max_tokens, sum_tokens,
    * padding_waste (= n_docs·max − sum, the padded-token overhead).
    */
  def lengthBucketedBatches(
      docs: DataFrame,
      shardCols: Seq[Column],
      tokenCol: Column,
      tieBreak: Column,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(shardCols.nonEmpty,
      "lengthBucketedBatches needs at least one shard column (a global " +
        "length sort cannot batch distributedly; shard by language/source/bucket)")
    val tok = coalesce(tokenCol.cast("long"), lit(0L))
    val w = Window.partitionBy(shardCols: _*).orderBy(tok.asc, tieBreak.asc)
    val batch = ((row_number().over(w) - 1) / batchSize).cast("long")
    docs
      .withColumn("__tok", tok)
      .withColumn("batch_idx", batch)
      .groupBy(shardCols :+ col("batch_idx"): _*)
      .agg(count(lit(1)).as("n_docs"),
        max(col("__tok")).as("max_tokens"),
        sum(col("__tok")).as("sum_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
  }
}
