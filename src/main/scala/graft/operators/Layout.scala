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
}
