package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: prune the large side of a join BEFORE
  * its shuffle using a compact membership sketch of the small side's keys.
  *
  * At 100 TB the dominant cost of a selective join is shuffling large-side
  * rows that will never find a partner. When the small side fits in a
  * broadcast, Spark already solves this (BroadcastHashJoin). The gap is the
  * middle regime: the small side's ROWS are too wide/many to broadcast as a
  * hash relation, but its KEY SET compresses to a few MB of Bloom bits
  * (10M keys @ 1% fpp ≈ 11 MB). Spark's own `InjectRuntimeFilter` applies
  * the same idea opportunistically; this operator makes it explicit and
  * deterministic for flow authors.
  *
  * Correctness is exact: the Bloom filter only PRUNES (false positives pass
  * through and are eliminated by the real join that follows), so the result
  * equals the plain join — which is exactly what the gate oracle checks.
  *
  * Reference has no counterpart (waimak delegates joins to raw Spark); this
  * is a beyond-parity scale operator.
  */
object Bloom {

  /** Inner/left-semi equi-join of `large` with `small`, with the large side
    * Bloom-pruned before the shuffle.
    *
    * Keys are matched positionally (`largeKeys(i) == smallKeys(i)`).
    * Composite keys are folded through `xxhash64` on both sides, so the
    * sketch always holds one long per row regardless of key arity.
    *
    * `expectedItems` sizes the filter; when <= 0 it is measured with a
    * cheap count on the small side (one extra job on the SMALL side only —
    * never on the large one).
    */
  def bloomPrunedJoin(
      large: DataFrame,
      largeKeys: Seq[String],
      small: DataFrame,
      smallKeys: Seq[String],
      fpp: Double = 0.01,
      expectedItems: Long = -1L,
      joinType: String = "inner"): DataFrame = {
    require(largeKeys.nonEmpty && largeKeys.size == smallKeys.size,
      "largeKeys and smallKeys must be non-empty and of equal arity")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    // pruning the large side is only sound when unmatched large rows are
    // dropped by the join anyway — a left/full join would silently lose the
    // unmatched rows the caller asked to keep
    require(Set("inner", "leftsemi").contains(joinType.toLowerCase.replace("_", "")),
      s"bloomPrunedJoin preserves semantics only for inner/left_semi joins, got $joinType")

    def keyHash(keys: Seq[String]): Column = xxhash64(keys.map(col): _*)

    // ONE evaluation of the small-side pipeline feeds the whole sketch
    // path: the distinct key hashes are materialized, sized (exact distinct
    // count — a row count would oversize the filter under key duplication),
    // and bloom-built from the stored blocks. The only other evaluation is
    // the join itself.
    val keys = Materialize(
      small.select(keyHash(smallKeys).as("_graft_bloom_key")).distinct())
    val n = if (expectedItems > 0) expectedItems else math.max(keys.count(), 1L)
    val filter = keys.stat.bloomFilter("_graft_bloom_key", n, fpp)
    Materialize.release(keys) // the sketch is driver-held from here
    // ...and a broadcast ships it once per executor, not once per task
    val bc = large.sparkSession.sparkContext.broadcast(filter)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))

    // the prune runs map-side, upstream of the join's Exchange: only rows
    // whose key hash is (probably) present ever get shuffled
    val pruned = large.where(mightContain(keyHash(largeKeys)))

    if (largeKeys == smallKeys) pruned.join(small, largeKeys, joinType)
    else {
      val cond = largeKeys.zip(smallKeys)
        .map { case (l, r) => pruned(l) === small(r) }
        .reduce(_ && _)
      pruned.join(small, cond, joinType)
    }
  }
}
