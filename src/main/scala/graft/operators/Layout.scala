package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering for
  * file-skipping at scale.
  *
  * Parquet scans prune row groups / files from column min-max statistics.
  * A linear sort gives perfect pruning on ONE column and none on the
  * others; interleaving the bits of several columns into one sort key keeps
  * every interleaved column's per-file value range narrow, so selective
  * filters on ANY of them skip most files. On a 100 TB table that is the
  * difference between scanning terabytes and scanning gigabytes for a
  * point-ish query on a secondary dimension.
  *
  * Everything here is plain codegen'd integer arithmetic (shifts, masks,
  * adds) — no UDF — so the key computation fuses into whole-stage codegen
  * and the write is one range-repartition by the key.
  */
object Layout {

  /** Bucket a numeric column into [0, 2^bits) by linear normalisation over
    * [min, max], clamping outliers into the edge buckets. Uses only exactly-
    * rounded IEEE ops (sub/div/mul/floor) so any engine recomputes the same
    * bucket. */
  def rangeBucket(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"max must exceed min, got [$min, $max]")
    require(bits > 0 && bits < 32, s"bits must be in [1,31], got $bits")
    val n = (1L << bits).toDouble
    val raw = floor((c.cast("double") - lit(min)) / lit(max - min) * lit(n)).cast("long")
    least(greatest(raw, lit(0L)), lit((1L << bits) - 1L))
  }

  /** Morton key: interleave the low `bits` bits of each (non-negative,
    * already-bucketed) column. Bit `b` of `cols(i)` lands at position
    * `b * cols.size + i` — so `cols(0)` occupies the least-significant
    * position of each interleave group. Total key width `bits * cols.size`
    * must fit a signed long. */
  def mortonKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "mortonKey needs at least 2 columns")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols.size must be in [1,63], got ${bits * cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same key as SQL text over column expressions — lets a verification
    * oracle replay the interleave. Every term is fully parenthesised:
    * Postgres-family engines (DuckDB included) give ALL bitwise operators
    * one precedence level, left-associative, so an unparenthesised
    * `a << 3 | b << 4` parses as `((a << 3) | b) << 4`. */
  def mortonKeySql(colExprs: Seq[String], bits: Int): String = {
    val n = colExprs.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- colExprs.zipWithIndex
    } yield s"(((($c) >> $b) & 1) << ${b * n + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Z-cluster a frame: range-repartition on the Morton key (contiguous
    * z-runs per output partition → tight per-file min-max on every
    * interleaved column), then sort within partitions so row groups inside
    * each file are tight too. The key is dropped before the caller writes. */
  def zOrdered(df: DataFrame, zCols: Seq[Column], bits: Int, numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    df.withColumn("_graft_z", mortonKey(zCols, bits))
      .repartitionByRange(numPartitions, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
  }

  /** Write `df` z-clustered on `zCols` as `numFiles` parquet files. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[Column], bits: Int,
      numFiles: Int): Unit =
    zOrdered(df, zCols, bits, numFiles).write.mode("overwrite").parquet(path)

  // ------------------------------------------------------------------
  // Exact integer path: [[rangeBucket]]'s double normalisation is exactly
  // rounded but cannot represent int64 magnitudes above 2^53 (epoch-ns
  // collapses neighbouring values), and it needs a caller-supplied range.
  // The methods below quantize raw INTEGER columns from observed min/max
  // stats with a pure bit shift — no floating point anywhere, so the level
  // (and therefore the z-value) is replayable bit-for-bit by any engine
  // with integer shifts.

  /** Exact-integer quantization of `x` into `[0, 2^bits)` given the
    * column's observed `[min, max]`: a SIGNED bit shift by
    * `bitLength(max - min) - bits` — right when the span is wider than the
    * target, LEFT when it is narrower. The up-shift matters: a narrow
    * dimension (a ~2^11 user-id range against 2^45 of epoch time) left in
    * its low bits would surrender every high interleave position to the
    * wide dimension, and the "z-order" would degenerate to a plain sort on
    * the wide column — measured as ZERO secondary-dimension row-group
    * pruning before the normalisation. `span >> / << shift < 2^bits`
    * either way. */
  def intLevel(x: Column, min: Long, max: Long, bits: Int): Column = {
    val span = max - min
    require(span >= 0,
      s"column range [$min, $max] overflows 64-bit span arithmetic")
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(span) - bits
    if (shift >= 0) shiftright(x.cast("long") - lit(min), shift)
    else shiftleft(x.cast("long") - lit(min), -shift)
  }

  /** Append a Morton key column over raw integer-valued `cols`: ONE
    * map-combined min/max stats aggregation (driver state = 2 longs per
    * column), then [[intLevel]] + [[mortonKey]] as pure map-side codegen
    * arithmetic. Nulls in any clustering column yield a null key.
    *
    * `ranges` skips the stats pass entirely — pass the known per-column
    * `(min, max)` (table metadata, a previous run, domain knowledge) and
    * the key derivation is a single map-side projection with NO extra scan
    * of the input. Values outside a declared range still get keys (levels
    * merely fall outside `[0, 2^bits)`), so a stale-but-close range
    * degrades locality, never correctness. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int,
      zCol: String = "z_value",
      ranges: Option[Seq[(Long, Long)]] = None): DataFrame = {
    require(cols.size >= 2, "zValue needs at least two clustering columns")
    require(!df.columns.contains(zCol),
      s"input already carries '$zCol' — pass a different zCol")
    val bounds: Seq[(Long, Long)] = ranges match {
      case Some(rs) =>
        require(rs.size == cols.size,
          s"ranges arity ${rs.size} must match cols arity ${cols.size}")
        rs
      case None =>
        val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(min(col(c).cast("long")).as(s"mn$i"),
            max(col(c).cast("long")).as(s"mx$i"))
        }
        val stats = df.agg(aggs.head, aggs.tail: _*).head()
        require(!(0 until cols.size * 2).exists(stats.isNullAt),
          s"zValue over an empty (or all-null) input — no range to quantize")
        cols.indices.map(i =>
          (stats.getAs[Long](s"mn$i"), stats.getAs[Long](s"mx$i")))
    }
    val levels = cols.zip(bounds).map { case (c, (mn, mx)) =>
      intLevel(col(c), mn, mx, bits)
    }
    df.withColumn(zCol, mortonKey(levels, bits))
  }

  /** [[zOrdered]] over raw integer columns: stats + exact quantization +
    * range partitioning on the key + a partition-local sort; the helper
    * column is dropped — the layout, not the value, is the product.
    * `ranges` as in [[zValue]]: provide known bounds to skip the stats
    * scan (one pass over the input instead of two). */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 18,
      numPartitions: Int = 0,
      ranges: Option[Seq[(Long, Long)]] = None): DataFrame = {
    val z = zValue(df, cols, bits, "__graft_z", ranges)
    val ranged =
      if (numPartitions > 0) z.repartitionByRange(numPartitions, col("__graft_z"))
      else z.repartitionByRange(col("__graft_z"))
    ranged.sortWithinPartitions(col("__graft_z")).drop("__graft_z")
  }
}
