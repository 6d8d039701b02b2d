package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of linear quality classifiers — the fastText-style
  * model-based filtering step of an LLM curation pipeline (score every
  * document with a trained classifier, keep what clears a threshold). The
  * reference framework has no model training at all (user transforms only —
  * SURVEY.md §2.9); this closes the loop so the corpus that defines the
  * filter is the corpus being filtered, with no detour through a separate
  * training system.
  *
  * Model: logistic-style linear classifier trained by full-batch gradient
  * descent. Two deliberate departures from the textbook recipe make the
  * training run BIT-REPRODUCIBLE across engines and cluster layouts, which
  * matters more for curation audits than a fractionally better fit:
  *
  *  - the link function is the rational sigmoid `0.5 + z / (2·(1+|z|))`
  *    instead of `1/(1+e^-z)`. It is bounded to (0,1), monotone, and
  *    sigmoid-shaped, but uses only `+ * / abs` — IEEE-exact operations that
  *    every engine computes identically, where libm `exp` differs in the
  *    last ulp between implementations and would compound over iterations
  *    through the weight feedback loop.
  *  - per-row gradient terms are rounded to a fixed-point grid and summed
  *    as integers. Float summation is order-dependent (partial aggregation
  *    sums in partition order, which varies with cluster layout); integer
  *    summation is associative, so the gradient — and therefore every
  *    weight trajectory — is identical on 1 core or 1000 executors.
  *
  * Scale shape: the feature frame is computed once and materialized;
  * each iteration is ONE map-combined global aggregation (d+1 integer sums,
  * a single row to the driver — never row data), and the updated weights
  * re-enter the plan as literals (the degenerate broadcast). Driver state is
  * O(d). Scoring is a pure map-side projection over literals: no shuffle
  * anywhere in train or score, so the operator costs `iterations + 1` scans
  * of the materialized feature frame regardless of corpus size. Gradient
  * sums accumulate in DECIMAL, not LONG: at 1e12 rows a 1e-6-grid fixed
  * point sum overflows 64 bits, and Spark's long `sum` wraps silently.
  */
object Classifier {

  /** Trained model: `weights(i)` multiplies `features(i)`, plus a bias. */
  final case class LinearModel(bias: Double, weights: Seq[Double]) {
    require(weights.nonEmpty, "model needs at least one feature weight")
  }

  private val FpScale = 6
  private val Fp = 1000000.0 // 10^FpScale, the fixed-point gradient grid

  /** `round(v, scale)` exactly as Spark SQL's `round` does it (decimal
    * HALF_UP) — driver-side weight updates must land on the same values a
    * SQL engine's `round` produces, or the next iteration's literals drift. */
  private def roundAt(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Rational sigmoid of a (already-computed) z column: IEEE-exact ops only. */
  private def sigmoidR(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** z = bias + w1*x1 + ... (left-associated, the order every SQL engine
    * parses `b + w1*x1 + w2*x2 + ...` in — association order is part of the
    * cross-engine contract since float addition does not reassociate). */
  private def zOf(model: LinearModel, xs: Seq[Column]): Column =
    model.weights.zip(xs).foldLeft(lit(model.bias): Column) {
      case (acc, (w, x)) => acc + lit(w) * x
    }

  /** Train a linear classifier on `df` by `iterations` rounds of full-batch
    * gradient descent from zero weights.
    *
    * `features` must be deterministic numeric expressions (cast to double
    * internally); `label` must evaluate to 0.0/1.0 doubles. Weights are
    * rounded to `scale` decimals after every update — the rounding both pins
    * cross-engine floats and regularises the trajectory onto a grid a SQL
    * oracle can replay exactly.
    */
  def trainLinear(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      iterations: Int = 20,
      learningRate: Double = 0.5,
      scale: Int = 6): LinearModel = {
    require(features.nonEmpty, "trainLinear needs at least one feature")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val d = features.size
    val xs = (0 until d).map(i => col(s"__x$i"))
    // one pass computes features + label; every iteration re-reads the
    // materialized result instead of re-running upstream transforms
    val f = Materialize(df.select(
      label.cast("double").as("__y") +:
        features.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__x$i") }: _*))
    val n = f.count().toDouble
    require(n > 0, "trainLinear over an empty frame")

    var model = LinearModel(0.0, Seq.fill(d)(0.0))
    var it = 0
    while (it < iterations) {
      val err = sigmoidR(zOf(model, xs)) - col("__y")
      // fixed-point grid then DECIMAL sum: exact, associative, unoverflowable
      def fp(term: Column) = sum(round(term * lit(Fp)).cast("decimal(38,0)"))
      val aggs = fp(err).as("__gb") +:
        xs.zipWithIndex.map { case (x, i) => fp(err * x).as(s"__g$i") }
      val row = f.agg(aggs.head, aggs.tail: _*).first()
      def grad(i: Int): Double =
        row.getDecimal(i).doubleValue() / Fp / n
      model = LinearModel(
        roundAt(model.bias - learningRate * grad(0), scale),
        (0 until d).map(i =>
          roundAt(model.weights(i) - learningRate * grad(i + 1), scale)))
      it += 1
    }
    Materialize.release(f)
    model
  }

  /** Score `df` with a trained model: adds `scoreCol` = rational sigmoid of
    * the linear combination, rounded to `scale`. Pure map-side projection —
    * composes with a filter (`score >= tau`) into a single narrow stage. */
  def score(
      df: DataFrame,
      features: Seq[Column],
      model: LinearModel,
      scoreCol: String = "quality_score",
      scale: Int = 6): DataFrame = {
    require(features.size == model.weights.size,
      s"model has ${model.weights.size} weights but ${features.size} features given")
    df.withColumn(scoreCol,
      round(sigmoidR(zOf(model, features.map(_.cast("double")))), scale))
  }
}
