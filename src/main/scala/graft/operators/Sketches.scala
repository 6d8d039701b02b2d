package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch with a DETERMINISTIC md5-derived hash family — the
  * heavy-hitter / frequency-estimation sketch for streams and corpora too
  * large for exact per-item state.
  *
  * The whole sketch is `depth × width` counters regardless of corpus size:
  * at 100 TB that is the point — frequency queries over an unbounded item
  * domain from a few KB of state, with the classic one-sided guarantee
  * (estimate ≥ true count; error ≤ N/width with probability 1−(1/2)^depth
  * for independent rows). Unlike HLL (whose sketch internals differ across
  * engines), the md5-affine construction is reproducible bit-for-bit in any
  * engine with md5 — so the DuckDB oracle recomputes the identical sketch
  * and the gate hash-compares estimates, not just bounds.
  *
  * Scale shape: cell assignment is map-side codegen arithmetic; the only
  * shuffle is the map-combined (depth, bucket) count — at most
  * `depth × width` groups survive the combine. Estimation joins the
  * (small) sketch relation, broadcast by AQE.
  */
object Sketches {

  /** Bucket-hash family for the CM sketch. [[Md5Hash]] (default) is
    * reproducible bit-for-bit in any engine with md5 — what makes the
    * DuckDB oracle able to recompute the identical sketch. [[XxHash]] uses
    * Spark's native codegen'd xxhash64 — several times cheaper per item
    * (no string building, no hex conv), the family to run at corpus scale
    * when no cross-engine replay is needed. Both are row-salted; the CM
    * one-sided guarantee and error bounds are identical. Sketches are only
    * mergeable/comparable when built with the SAME family (and depth and
    * width) — like the hash seed, it is part of the sketch's identity. */
  sealed trait CmHashFamily
  case object Md5Hash extends CmHashFamily
  case object XxHash extends CmHashFamily

  /** The row-`d` bucket of `item`. Md5 family: md5 of a row-tagged item
    * string, first 32 bits, mod `width` — same value as DuckDB's
    * `('0x' || substr(md5('cm_' || d || '_' || item), 1, 8))::BIGINT % width`.
    * XxHash family: `pmod(xxhash64(d, item), width)` — native, no oracle. */
  private def bucket(item: Column, d: Int, width: Int,
      family: CmHashFamily): Column = family match {
    case Md5Hash =>
      conv(substring(md5(concat(lit(s"cm_${d}_"), item)), 1, 8), 16, 10)
        .cast("long") % width
    case XxHash =>
      pmod(xxhash64(lit(d), item), lit(width.toLong))
  }

  /** All `depth` bucket assignments of an item, as an array column.
    * Md5 family: ONE fused digest kernel for all depths
    * ([[graft.sql.CmBuckets]]) — value-identical to [[bucketsChained]],
    * the per-depth md5/conv chain it replaced (kept below as the spec
    * twin), which cost ~13 µs per (row, depth) in string round-trips and
    * dominated the q131 sketch build. A null item keeps the chain's
    * shape: an array of null buckets, not a null array. The cast to
    * string matches the implicit cast `concat` applied in the chain. */
  private[graft] def buckets(item: Column, depth: Int, width: Int,
      family: CmHashFamily = Md5Hash): Column = family match {
    case Md5Hash =>
      val s = item.cast("string")
      when(s.isNull,
        array((0 until depth).map(_ => lit(null).cast("long")): _*))
        .otherwise(call_function("graft_cm_buckets", s, lit(depth), lit(width)))
    case XxHash =>
      array((0 until depth).map(d => bucket(item, d, width, family)): _*)
  }

  /** The pre-round-14 expression chain — spec verification surface only
    * (SketchKernelSpec pins [[buckets]] equal to it row by row). */
  private[graft] def bucketsChained(item: Column, depth: Int, width: Int,
      family: CmHashFamily = Md5Hash): Column =
    array((0 until depth).map(d => bucket(item, d, width, family)): _*)

  /** Build the sketch: one row per non-empty (cm_depth, cm_bucket) cell
    * with its count. At most depth×width rows. */
  def countMinSketch(items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024,
      family: CmHashFamily = Md5Hash): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    graft.sql.functions.ensureRegistered(items.sparkSession)
    items
      .select(posexplode(buckets(col(itemCol), depth, width, family))
        .as(Seq("cm_depth", "cm_bucket")))
      .groupBy(col("cm_depth"), col("cm_bucket"))
      .agg(count(lit(1)).as("cm_count"))
  }

  /** Build the sketch from PRE-AGGREGATED (item, weight) rows: each cell
    * accumulates the weight instead of a row count. Count-min is linear, so
    * this equals [[countMinSketch]] over the raw instance stream bit-for-bit
    * — but hashes each DISTINCT item once instead of once per occurrence.
    * At 100 TB this is the construction to use whenever a frequency frame
    * already exists (or is cheap to map-combine): the md5 family runs over
    * the vocabulary, not the corpus. */
  def countMinSketchWeighted(items: DataFrame, itemCol: String, weightCol: String,
      depth: Int = 4, width: Int = 1024,
      family: CmHashFamily = Md5Hash): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    graft.sql.functions.ensureRegistered(items.sparkSession)
    items
      .select(col(weightCol).cast("long").as("cm_w"),
        posexplode(buckets(col(itemCol), depth, width, family))
          .as(Seq("cm_depth", "cm_bucket")))
      .groupBy(col("cm_depth"), col("cm_bucket"))
      .agg(sum(col("cm_w")).as("cm_count"))
  }

  /** Merge sketches built with the SAME (depth, width, hash family):
    * cell-wise sum. Count-min is a linear sketch, so
    * merge(sketch(A), sketch(B)) == sketch(A ++ B) exactly — per-partition
    * or per-day sketches combine without ever re-scanning the corpora,
    * which is what makes the monitor distributable and incremental. */
  def mergeSketches(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "mergeSketches needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("cm_depth"), col("cm_bucket"))
      .agg(sum(col("cm_count")).as("cm_count"))
  }

  /** Single-pass heavy-hitter detection — the at-scale replacement for a
    * full `groupBy(item).count().where(count >= T)` report when the item
    * domain is huge and the heavy set is small (hot tokens, hot URLs, hot
    * join keys):
    *
    *  1. ONE corpus pass map-combines exact per-item counts into a
    *     vocabulary-sized frame (the shuffle carries each partition's
    *     distinct items, not instances — zipfian token streams combine
    *     ~100:1 map-side);
    *  2. the count-min sketch is built FROM the weighted count frame
    *     ([[countMinSketchWeighted]] — count-min is linear, so this equals
    *     sketching the raw instance stream bit-for-bit) and pulled to the
    *     driver — legitimately, because bounded driver state (depth×width
    *     cells) is the sketch's whole contract (same footing as k-means
    *     centroids / PQ codebooks);
    *  3. candidates (estimate ≥ threshold, pure codegen arithmetic over the
    *     literal cell array — no join) filter and confirm against the SAME
    *     count frame, so the corpus is never re-scanned.
    *
    * Round 12 (verdict item 3): the previous shape scanned the corpus twice
    * — once to sketch the instance stream, once to exact-count candidate
    * instances. Both the sketch and the confirm are pure functions of the
    * counts, so counting once and deriving both from the vocab-sized frame
    * halves the dominant cost; estimates and output are unchanged.
    *
    * One-sidedness (estimate ≥ truth) makes the candidate set a SUPERSET of
    * the true heavy set, so the exact confirm cannot miss a heavy item; the
    * `confirmed` flag marks which candidates survived exact counting.
    * Output: item, cm_estimate, exact_count, confirmed. */
  def heavyHitters(items: DataFrame, itemCol: String, threshold: Long,
      depth: Int = 4, width: Int = 1024,
      family: CmHashFamily = Md5Hash): DataFrame = {
    require(threshold >= 1, "threshold must be >= 1")
    graft.sql.functions.ensureRegistered(items.sparkSession)
    // vocab-sized; materialized once so the sketch collect and the confirm
    // filter don't each re-run the corpus pass
    val counts = items
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("exact_count"))
      .transform(Materialize.apply)
    // flat depth×width cell array on the driver (absent cell = 0)
    val flat = new Array[Long](depth * width)
    countMinSketchWeighted(counts, itemCol, "exact_count", depth, width, family)
      .collect().foreach { r =>
        flat(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
      }
    val cells = typedLit(flat.toSeq)
    val est = array_min(transform(buckets(col(itemCol), depth, width, family),
      (b, d) => element_at(cells, (d * width + b + 1).cast("int"))))
    counts
      .where(est >= threshold)
      .withColumn("cm_estimate", est)
      .withColumn("confirmed", col("exact_count") >= threshold)
      .select(col(itemCol), col("cm_estimate"), col("exact_count"),
        col("confirmed"))
  }

  /** Estimate counts for each distinct item in `queries(itemCol)`:
    * min over the sketch rows of the item's cell counts (absent cell = 0).
    * Returns the query frame's columns plus `cm_estimate`. */
  def countMinEstimate(queries: DataFrame, itemCol: String, sketch: DataFrame,
      depth: Int = 4, width: Int = 1024,
      family: CmHashFamily = Md5Hash): DataFrame = {
    graft.sql.functions.ensureRegistered(queries.sparkSession)
    val qCols = queries.columns.map(col)
    queries
      .select(qCols :+ posexplode(buckets(col(itemCol), depth, width, family))
        .as(Seq("cm_depth", "cm_bucket")): _*)
      .join(sketch, Seq("cm_depth", "cm_bucket"), "left")
      .groupBy(qCols: _*)
      .agg(min(coalesce(col("cm_count"), lit(0L))).as("cm_estimate"))
  }

  /** Equi-join SIZE estimate from two count-min sketches — the classic
    * sketch inner product (Cormode & Muthukrishnan 2005): for each depth
    * row, Σ_buckets cmA·cmB over-counts the true Σ_keys fA(k)·fB(k) only
    * by hash collisions, so the MIN over depths is a one-sided (never
    * under) estimate of the join's output row count. The pre-flight
    * shuffle-sizing check for a 100 TB join: both sides reduce to
    * depth×width cells (map-combined), the estimate joins two tiny
    * relations — no data is joined to learn how big the join would be.
    * Output: 1 row (cm_join_estimate long). */
  def cmJoinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame,
      depth: Option[Int] = None): DataFrame = {
    val a = sketchA.select(col("cm_depth"), col("cm_bucket"),
      col("cm_count").as("cm_a"))
    val b = sketchB.select(col("cm_depth"), col("cm_bucket"),
      col("cm_count").as("cm_b"))
    // per-cell products only exist where BOTH sides hit the cell (inner
    // join), but the min must range over EVERY depth row — a depth with no
    // overlapping cells has dot = 0 and is the TIGHTEST bound (true join
    // size 0). Left-join the dots onto the depth spine and coalesce absent
    // depths to 0; fully-empty sketches (no rows at all) collapse to a
    // single 0 row, never NULL. When the caller knows the sketch `depth`
    // the spine is a literal range (no shuffle); otherwise it is recovered
    // from the sketches themselves (union + distinct — two extra tiny
    // shuffles, rows ≤ depth).
    val depths = depth match {
      case Some(d) =>
        sketchA.sparkSession.range(d).select(col("id").cast("int").as("cm_depth"))
      case None =>
        a.select(col("cm_depth")).union(b.select(col("cm_depth"))).distinct()
    }
    val dots = a.join(b, Seq("cm_depth", "cm_bucket"))
      .groupBy(col("cm_depth"))
      .agg(sum(col("cm_a") * col("cm_b")).as("dot"))
    depths.join(dots, Seq("cm_depth"), "left")
      .agg(coalesce(min(coalesce(col("dot"), lit(0L))), lit(0L))
        .cast("long").as("cm_join_estimate"))
  }

  // ---- KMV distinct sketches (graft.sql.KmvSketch) -----------------------

  /** 2^60 as an exact double — the KMV hash domain size. */
  private val KmvDomain = 1152921504606846976.0

  /** The KMV item hash, uniform on [0, 2^60). Md5 family: first 15 md5 hex
    * chars as a long — `('0x' || substr(md5(x), 1, 15))::BIGINT` in DuckDB.
    * XxHash family: native xxhash64 masked to 60 bits — the production
    * choice when no cross-engine replay is needed (same [[CmHashFamily]]
    * contract as the count-min suite: sketches only merge/compare within
    * one family). */
  def kmvHash(item: Column, family: CmHashFamily = Md5Hash): Column =
    family match {
      case Md5Hash =>
        // fused digest kernel, value-identical to
        // conv(substring(md5(x),1,15),16,10).cast("long")
        graft.sql.functions.md5Prefix64(item.cast("string"), 15)
      case XxHash =>
        xxhash64(item).bitwiseAND(lit((1L << 60) - 1))
    }

  /** Per-group KMV sketch over `item`: `groupCols` plus a sorted-ascending
    * `kmv` array of the k smallest distinct item hashes. Buffer state is k
    * longs per group and combines map-side ([[graft.sql.KmvSketch]]). */
  def kmvSketch(df: DataFrame, groupCols: Seq[Column], item: Column,
      k: Int, family: CmHashFamily = Md5Hash): DataFrame = {
    graft.sql.functions.ensureRegistered(df.sparkSession)
    df.groupBy(groupCols: _*)
      .agg(call_function("graft_kmv", kmvHash(item, family), lit(k)).as("kmv"))
  }

  /** Distinct-count estimate from a KMV array: exact size below k (the
    * sketch then IS the distinct hash set), else (k-1) * 2^60 / kth. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvDomain) /
        element_at(kmv, k).cast("double"))

  /** Merge two KMV arrays: the k smallest of their distinct union — the
    * sketch of the union of the underlying sets. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Intersection-cardinality estimate of the sets behind two sketches:
    * Jaccard over the union sketch (the fraction of its values present in
    * BOTH inputs) times the union estimate. Degrades to the exact common
    * count when the union carries fewer than k values. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = kmvMerge(a, b, k)
    val common = size(filter(u, x => array_contains(a, x) && array_contains(b, x)))
    common.cast("double") / size(u).cast("double") * kmvEstimate(u, k)
  }
}
