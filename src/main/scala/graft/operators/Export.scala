package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export — the pipeline ENDING: a curated corpus leaves the
  * engine as fixed-size-ish shards with a verifiable manifest, so the
  * training side can schedule, resume and integrity-check without touching
  * the engine again.
  *
  * Shard assignment is content-hash-bucketed, NOT row_number-based: an
  * exact-count split needs a global ordering (one sort partition — the
  * classic scale killer), while hash bucketing is map-side, stays balanced
  * by the law of large numbers (shards deviate from `docsPerShard` by
  * ~sqrt), and gives every doc a REPRODUCIBLE home: re-exporting the same
  * corpus yields identical shards, and an incremental re-export moves only
  * docs whose content changed. One count job sizes the shard space;
  * everything after is narrow.
  */
object Export {

  /** Append a deterministic `shard` column in [0, ceil(n / docsPerShard)).
    * The shard space size comes from ONE count job; assignment is the
    * 60-bit md5 bucket of `key` — stable under re-runs and repartitioning. */
  def shardAssignment(df: DataFrame, key: Column, docsPerShard: Long,
      shardCol: String = "shard"): DataFrame = {
    require(docsPerShard > 0, s"docsPerShard must be > 0, got $docsPerShard")
    require(!df.columns.contains(shardCol),
      s"input already carries '$shardCol' — pass a different shardCol")
    val n = df.count()
    val nShards = math.max((n + docsPerShard - 1) / docsPerShard, 1L).toInt
    df.withColumn(shardCol, Sampling.hashBucket(key, nShards))
  }

  /** Deterministic training-epoch shuffle: every row gets a reproducible
    * (shard, pos) address — shard = 60-bit content-hash bucket, pos =
    * hash-order rank WITHIN the shard. The "global random order" a
    * training run consumes is (shard, pos) lexicographic, but no global
    * sort ever runs — and no SHARD-sized sort either: the rank space is
    * cut into `nBands` contiguous ranges (the top log2(nBands) bits of
    * the 60-bit rank), per-(shard, band) counts cumulate on a tiny
    * nShards x nBands frame, and each row's pos is its band's offset plus
    * a within-(shard, band) row_number — the [[Sampling.budgetSelect]]
    * two-level trick. Window parallelism is nShards x nBands tasks of
    * ~corpus/(nShards x nBands) rows each, instead of nShards tasks
    * owning ~corpus/nShards apiece (at 100 TB / 1024 shards a
    * one-task-per-shard sort is ~100 GB — the classic funnel). Bands are
    * contiguous in rank, so band-major-then-rank order IS rank order and
    * pos is bit-identical to the single-window formulation.
    *
    * A different `epoch` salt re-permutes both shard membership and
    * in-shard order, giving per-epoch reshuffles with zero extra
    * machinery; epoch 0 of the same corpus is always byte-identical
    * (resumable exports). Hash ties (distinct keys colliding on the
    * 60-bit rank) break on the key's string form — same rank means same
    * band, so the tie-break never crosses a window boundary and `pos` is
    * total and engine-reproducible. */
  def shuffleShard(df: DataFrame, key: Column, nShards: Int, epoch: Int = 0,
      shardCol: String = "shard", posCol: String = "pos",
      nBands: Int = 64): DataFrame = {
    require(nShards > 0, s"nShards must be > 0, got $nShards")
    require(nBands > 0 && (nBands & (nBands - 1)) == 0,
      s"nBands must be a power of two, got $nBands")
    require(!df.columns.contains(shardCol) && !df.columns.contains(posCol),
      s"input already carries '$shardCol' or '$posCol'")
    val salted = concat(key.cast("string"), lit(s"_epoch_$epoch"))
    val rank = Sampling.hashRank(salted)
    val shard = pmod(rank, lit(nShards.toLong))
    // top bits of the 60-bit rank: bands are CONTIGUOUS rank ranges
    val shiftBits = 60 - Integer.numberOfTrailingZeros(nBands)
    val keyed = df.withColumn(shardCol, shard)
      .withColumn("__graft_band", shiftright(rank, shiftBits))
      .withColumn("__graft_rk", rank)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("__graft_band").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col(shardCol), col("__graft_band"))
      .agg(count(lit(1)).as("__graft_bc"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_bc")).over(wOff), lit(0L)))
      .select(col(shardCol), col("__graft_band"), col("__graft_off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol), col("__graft_band"))
      .orderBy(col("__graft_rk").asc, key.cast("string").asc)
    keyed.join(broadcast(offsets), Seq(shardCol, "__graft_band"))
      .withColumn(posCol,
        (col("__graft_off") + row_number().over(wIn)).cast("long"))
      .drop("__graft_band", "__graft_rk", "__graft_off")
  }

  /** Per-shard manifest: row count plus an ORDER-INSENSITIVE content
    * fingerprint (xor of the docs' 60-bit key hashes) and the key range —
    * enough for the consumer to integrity-check a shard without re-reading
    * the corpus. One map-combined aggregation. */
  def shardManifest(df: DataFrame, key: Column,
      shardCol: String = "shard"): DataFrame =
    df.groupBy(col(shardCol))
      .agg(
        count(lit(1)).as("n_docs"),
        bit_xor(Sampling.hashRank(key)).as("content_xor"),
        min(key).as("min_key"),
        max(key).as("max_key"))

  /** Write the corpus as hive-partitioned shard folders
    * (`<path>/shard=N/`) and return the manifest of what was written.
    * The write repartitions BY the shard column first so each shard folder
    * is one task's output (one file per shard at `docsPerShard` sized for
    * a task), not `shuffle.partitions` fragments. */
  def writeShards(df: DataFrame, key: Column, path: String,
      docsPerShard: Long, format: String = "parquet"): DataFrame = {
    val assigned = shardAssignment(df, key, docsPerShard)
    assigned
      .repartition(col("shard"))
      .write.mode("overwrite").format(format)
      .partitionBy("shard").save(path)
    // Manifest from the WRITTEN shards, not the source lineage: re-evaluating
    // `assigned` would scan the input a second time, and a non-deterministic
    // source (or one overlapping the just-overwritten output path) would
    // yield a manifest describing shards that were never written. Partition
    // inference types `shard` int32 — cast back to long so the manifest
    // schema matches shardAssignment's output either way.
    shardManifest(df.sparkSession.read.format(format).load(path)
      .withColumn("shard", col("shard").cast("long")), key)
  }
}
