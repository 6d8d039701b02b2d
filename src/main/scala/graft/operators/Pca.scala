package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction over an embedding column
  * — the whitening / dimensionality-analysis step of an embedding pipeline
  * ("how anisotropic is this embedding space, and along which direction?").
  *
  * Scale shape: the ONLY corpus-sized work is one pass accumulating the
  * d×d second-moment (Gramian) matrix and the d-vector of first moments,
  * fused into a single bounded custom aggregate
  * ([[graft.sql.GramianMoments]]) — per-partition state is
  * 2 + d + d(d+1)/2 longs and the d²/2 multiply-adds per row run in one
  * tight JVM loop, so the cost is FLOPs-bound (the FLOPs any covariance
  * computation pays) with no row amplification and a shuffle of one
  * moment vector per partition. Driver state is the d×d covariance matrix
  * plus the iteration vector: O(d²), independent of corpus size — at
  * d=1024 that is 8 MB on the driver; the corpus never moves.
  *
  * Determinism contract (the property that makes the result verifiable by
  * an independent SQL engine, and bit-stable across partitionings): there
  * are NO cross-row floating-point sums anywhere. Every aggregated term is
  * quantized to an integer (product × 10⁹ for the moment sums, term × 10¹⁵
  * for the driver-side matrix-vector/Rayleigh sums) and summed exactly in
  * 64-bit integers — integer addition commutes, so partition order, AQE
  * re-plans, and engine differences cannot move the result even by an ulp.
  * Per-step rounding alone is NOT enough: a float sum landing within
  * sum-order noise of a rounding boundary flips between engines and the
  * flip amplifies through power iterations (observed in testing); exact
  * integer accumulation removes the boundary entirely. The quantization is
  * part of the operator's semantics (a covariance resolved to 1e-9 — far
  * below embedding noise). The moment quantum is FIXED at 10⁹ (it is baked
  * into the matching oracle SQL contract, so it is not a parameter), which
  * bounds the supported corpus: |x·y|·10⁹ summed in a long overflows past
  * ~9.2·10⁹ units of accumulated product magnitude — ~10⁹ rows of
  * unit-normalized embeddings, ~10⁷ rows at product magnitude ~100.
  * Corpora beyond that bound should pre-aggregate per shard (sum of exact
  * long partials across shards stays exact) rather than re-quantize.
  *
  * The power iteration runs on the driver over the collected d×d matrix (a
  * 100 TB corpus with d=64 still collects exactly 64×64 entries): a FIXED
  * number of iterations from the uniform start vector 1/d, every iterate
  * component rounded to 9 decimals. The final sign is fixed by making the
  * largest-|loading| component positive (smallest index on ties) —
  * eigenvectors are sign-ambiguous otherwise.
  */
object Pca {

  /** HALF_UP (away from zero) rounding to a long — the same rule Spark's
    * `round` and DuckDB's `round` apply, so driver-side quantization
    * matches in-engine quantization exactly. */
  private def qRound(t: Double): Long =
    BigDecimal(t).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def round9(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Top principal component of `vecCol` (array of float/double, equal
    * lengths). Output: one row per dimension — (pos, loading, var_share)
    * where `loading` is the unit eigenvector component (rounded to
    * `scale`) and `var_share` the Rayleigh-quotient share of total
    * variance captured (same value on every row). */
  def principalComponent(df: DataFrame, vecCol: String, iterations: Int = 4,
      matScale: Int = 9, scale: Int = 6): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = df.sparkSession

    // both moment passes fused into ONE bounded custom aggregate
    // (sql.GramianMoments): per-partition state is 2 + d + d(d+1)/2 longs,
    // terms quantized with the identical HALF_UP-×1e9 rule the former
    // posexplode formulation applied (spec-pinned equal) — same exact
    // integer sums, without the d(d+1)/2-generated-rows-per-input-row
    // amplification through a hash aggregate (4,096× at d=64)
    graft.sql.functions.ensureRegistered(spark)
    val moments = df
      .agg(call_function("graft_gramian", col(vecCol).cast("array<double>")))
      .head().getSeq[Long](0)
    require(moments.nonEmpty, s"principalComponent over an empty '$vecCol'")
    val (v, share) = topComponentFromMoments(moments, iterations, matScale, scale)

    import spark.implicits._
    v.zipWithIndex
      .map { case (x, i) => (i.toLong, round9(x, scale), share) }
      .toSeq.toDF("pos", "loading", "var_share")
  }

  /** Deterministic top component from a [[graft.sql.GramianMoments]] result
    * vector — the driver-side (or per-window, the vector is O(d²)) half of
    * [[principalComponent]], shared with the streaming drift twin. Returns
    * (unit eigenvector at `matScale` rounding, Rayleigh var share at
    * `scale`). Same exact-integer-sum contract throughout: every
    * accumulated term is quantized before summation, so the result is
    * independent of where this runs. */
  private[graft] def topComponentFromMoments(moments: Seq[Long],
      iterations: Int, matScale: Int = 9,
      scale: Int = 6): (Array[Double], Double) = {
    val Q9 = 1000000000.0 // moment quantum: product resolved to 1e-9
    val Q15 = 1.0e15 // driver-sum quantum: iteration terms resolved to 1e-15
    val d = moments(0).toInt
    val n = moments(1).toDouble
    val mean = new Array[Double](d)
    (0 until d).foreach(i => mean(i) = moments(2 + i).toDouble / Q9 / n)

    val cov = Array.ofDim[Double](d, d)
    var triBase = 2 + d
    for (i <- 0 until d) {
      for (j <- i until d) {
        val sp9 = moments(triBase + j - i)
        val c = round9(sp9.toDouble / Q9 / n - mean(i) * mean(j), matScale)
        cov(i)(j) = c
        cov(j)(i) = c
      }
      triBase += d - i
    }

    // fixed-round power iteration; every sum accumulates quantized terms
    // in a long so j-order is irrelevant
    var v = Array.fill(d)(1.0 / d)
    var it = 0
    while (it < iterations) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0L
        var j = 0
        while (j < d) { acc += qRound(cov(i)(j) * v(j) * Q15); j += 1 }
        w(i) = round9(acc.toDouble / Q15, matScale)
        i += 1
      }
      var nrm2 = 0L
      var k = 0
      while (k < d) { nrm2 += qRound(w(k) * w(k) * Q15); k += 1 }
      val nrm = math.sqrt(nrm2.toDouble / Q15)
      require(nrm > 0, "power iteration collapsed to the zero vector " +
        "(covariance is exactly zero — constant input vectors?)")
      v = w.map(x => round9(x / nrm, matScale))
      it += 1
    }

    // sign convention: largest-|component| entry positive, ties to the
    // smallest index
    val kMax = v.indices.maxBy(i => (math.abs(v(i)), -i))
    if (v(kMax) < 0) v = v.map(-_)

    // Rayleigh share of total variance (v is unit only up to rounding —
    // normalize by v'v); same exact-term-sum contract
    var num = 0L
    var den = 0L
    var tr9 = 0L
    for (i <- 0 until d) {
      den += qRound(v(i) * v(i) * Q15)
      tr9 += qRound(cov(i)(i) * Q9)
      for (j <- 0 until d) num += qRound(v(i) * cov(i)(j) * v(j) * Q15)
    }
    val trace = tr9.toDouble / Q9
    val share =
      if (trace > 0) round9(num.toDouble / den.toDouble / trace, scale)
      else Double.NaN
    (v, share)
  }
}
