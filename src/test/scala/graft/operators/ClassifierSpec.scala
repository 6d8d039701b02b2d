package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class ClassifierSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  // cleanly separable 1-D data: positives at x=2, negatives at x=-2
  private def separable = (Seq.fill(20)((2.0, 1.0)) ++ Seq.fill(20)((-2.0, 0.0)))
    .toDF("x", "y")

  it("training is deterministic: two runs produce the identical model") {
    val df = separable
    val a = Classifier.trainLinear(df, Seq($"x"), $"y", iterations = 5)
    val b = Classifier.trainLinear(df, Seq($"x"), $"y", iterations = 5)
    a shouldBe b
  }

  it("separable data separates: every score lands on the label's side of 0.5") {
    val df = separable
    val model = Classifier.trainLinear(df, Seq($"x"), $"y", iterations = 10)
    model.weights.head should be > 0.0 // positive feature correlates with y=1
    val wrong = Classifier.score(df, Seq($"x"), model)
      .where(($"quality_score" >= 0.5) =!= ($"y" === 1.0)).count()
    wrong shouldBe 0L
  }

  it("first-iteration weights follow the closed form (p=0.5 at zero weights)") {
    // at w=0 every prediction is exactly 0.5, so grad_w = mean((0.5-y)*x):
    // here (0.5-1)*2 = -1 on positives and (0.5-0)*(-2) = -1 on negatives
    // -> grad = -1, w1 = 0 - 0.5*(-1) = 0.5; classes balance the bias grad to 0
    val model = Classifier.trainLinear(separable, Seq($"x"), $"y",
      iterations = 1, learningRate = 0.5)
    model shouldBe Classifier.LinearModel(0.0, Seq(0.5))
  }

  it("score matches the rational sigmoid computed by hand") {
    val model = Classifier.LinearModel(bias = 0.25, weights = Seq(1.5))
    val got = Classifier.score(Seq(2.0).toDF("x"), Seq($"x"), model)
      .select("quality_score").as[Double].head()
    val z = 0.25 + 1.5 * 2.0
    got shouldBe BigDecimal(0.5 + z / (2.0 * (1.0 + math.abs(z))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  it("scoring is a pure map-side projection: no shuffle in the plan") {
    val model = Classifier.LinearModel(0.1, Seq(0.2))
    val plan = Classifier.score(Seq(1.0, 2.0).toDF("x"), Seq($"x"), model)
      .queryExecution.executedPlan
    plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
  }

  it("training aggregation map-combines (partial integer sums, no row shuffle)") {
    // the per-iteration plan is observable via the same agg the loop runs:
    // a global sum of fixed-point longs must show a partial aggregate
    val f = separable.select($"y".as("__y"), $"x".as("__x0"))
    val agg = f.agg(sum(round(($"__y" - lit(0.5)) * lit(1000000.0))
      .cast("decimal(38,0)")).as("g"))
    val txt = agg.queryExecution.executedPlan.toString
    txt should include("partial_sum")
  }

  it("rejects empty features and feature/weight arity mismatch") {
    an[IllegalArgumentException] should be thrownBy
      Classifier.trainLinear(separable, Seq.empty, $"y")
    an[IllegalArgumentException] should be thrownBy
      Classifier.score(separable, Seq($"x"),
        Classifier.LinearModel(0.0, Seq(0.1, 0.2)))
    an[IllegalArgumentException] should be thrownBy
      Classifier.LinearModel(0.0, Seq.empty)
  }
}
