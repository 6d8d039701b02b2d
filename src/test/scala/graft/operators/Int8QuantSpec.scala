package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class Int8QuantSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val emb = Seq(
    (1L, Seq(0.0f, 10.0f, 5.0f)),
    (2L, Seq(1.0f, 10.0f, -5.0f)),
    (3L, Seq(0.5f, 10.0f, 0.0f))).toDF("vec_id", "embedding")

  private def rows = Quantization.int8Quantize(emb, "vec_id", "embedding")
    .select($"id", $"codes", $"mse").as[(Long, Seq[Int], Double)]
    .collect().toSeq.sortBy(_._1)

  it("codes stay in [-128, 127]; range extremes map to the end codes") {
    val r = rows
    r.flatMap(_._2).foreach { c => c should (be >= -128 and be <= 127) }
    // dim 1: min=0.0 -> code -128, max=1.0 -> 127; dim 3: min -5 -> -128, max 5 -> 127
    r.find(_._1 == 1L).get._2.head shouldBe -128
    r.find(_._1 == 2L).get._2.head shouldBe 127
    r.find(_._1 == 2L).get._2(2) shouldBe -128
    r.find(_._1 == 1L).get._2(2) shouldBe 127
  }

  it("a constant dimension codes to 0 and contributes zero error") {
    rows.foreach { case (_, codes, _) => codes(1) shouldBe 0 }
    val solo = Quantization.int8Quantize(
      Seq((1L, Seq(3.0f, 3.0f))).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select($"mse").as[Double].head()
    solo shouldBe 0.0
  }

  it("reconstruction MSE is bounded by the per-dim quantization step") {
    // worst case per dim: (range/255)^2 / 4 at the cell midpoint decision
    // boundary; the bound below is the mean of per-dim worst cases
    val ranges = Seq(1.0, 0.0, 10.0)
    val bound = ranges.map(r => math.pow(r / 255.0, 2) / 4).sum / 3 + 1e-12
    rows.foreach { case (_, _, mse) => mse should be <= bound }
  }

  it("more spread in a dimension means coarser cells and larger error") {
    val narrow = Quantization.int8Quantize(
      Seq((1L, Seq(0.30f)), (2L, Seq(0.31f)), (3L, Seq(0.80f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .agg(max($"mse")).as[Double].head()
    val wide = Quantization.int8Quantize(
      Seq((1L, Seq(30.0f)), (2L, Seq(31.0f)), (3L, Seq(80.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .agg(max($"mse")).as[Double].head()
    wide should be > narrow
  }

  it("empty or all-null input raises the friendly require message, not an NPE") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Quantization.int8Quantize(empty, "vec_id", "embedding")
    }
    e1.getMessage should include("empty/null")
    val allNull = Seq(1L, 2L).toDF("vec_id")
      .withColumn("embedding", lit(null).cast("array<float>"))
    val e2 = intercept[IllegalArgumentException] {
      Quantization.int8Quantize(allNull, "vec_id", "embedding")
    }
    e2.getMessage should include("empty/null")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.centroids(empty.withColumn("label", lit("x")),
        "label", "embedding")
    }
    e3.getMessage should include("empty/null")
  }

  it("ragged shorter vectors survive under ANSI (null past-the-end, not a throw)") {
    // ANSI element_at past the array end throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT;
    // the operators use try_element_at so short vectors contribute null
    spark.conf.get("spark.sql.ansi.enabled") shouldBe "true"
    val ragged = Seq(
      (1L, "a", Seq(1.0f, 2.0f, 3.0f)),
      (2L, "a", Seq(4.0f))).toDF("vec_id", "label", "embedding")
    noException should be thrownBy
      Quantization.int8Quantize(ragged, "vec_id", "embedding").collect()
    val cents = Similarity.centroids(ragged, "label", "embedding")
      .as[(String, Long, Option[Double])].collect().sortBy(_._2)
    // dim 0 averages both vectors; dims 1-2 only the long one
    cents.map(_._3.get) shouldBe Array(2.5, 2.0, 3.0)
  }
}
