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

  it("native kernel is bit-identical to the HOF formulation, null/NaN quirks included (r14)") {
    // the round-13 two-transforms+aggregate chain, reconstructed here as
    // the twin: a null element must code -128 and null the MSE (greatest
    // skips the null floor); a NaN element — which also turns the dim's
    // max stat NaN and so degrades EVERY row's dim-0 — must ride Spark's
    // floor(double)->BIGINT conversion (NaN -> 0 -> code -128) and turn
    // the MSE NaN; constant dims code 0 with zero error; ragged vectors
    // keep their own length
    val adv = spark.sql(Seq(
      "SELECT 1L AS vec_id, array(cast(0.0 AS float), cast(10.0 AS float), cast(5.0 AS float)) AS embedding",
      "SELECT 2L, array(cast(1.0 AS float), cast(10.0 AS float), cast(-5.0 AS float))",
      "SELECT 3L, array(cast('NaN' AS float), cast(9.0 AS float))",
      "SELECT 4L, array(cast(null AS float), cast(2.0 AS float), cast(7.0 AS float))",
      "SELECT 5L, array(cast(4.0 AS float))",
      "SELECT 6L, array(cast(2.5 AS float), cast(10.0 AS float), cast(5.0 AS float), cast(null AS float))",
      "SELECT 7L, array(cast(-7.25 AS float), cast(11.5 AS float))")
      .mkString(" UNION ALL "))
    // twin = the old column-expression formulation, verbatim
    val dim = adv.agg(max(org.apache.spark.sql.functions.size($"embedding"))).head().getInt(0)
    val packed = adv.agg(
      array((0 until dim).map(i =>
        min(try_element_at($"embedding", lit(i + 1))).cast("double")): _*).as("__mins"),
      array((0 until dim).map(i =>
        max(try_element_at($"embedding", lit(i + 1))).cast("double")): _*).as("__maxs"))
    val v = (i: org.apache.spark.sql.Column) => try_element_at($"embedding", i + 1).cast("double")
    val mn = (i: org.apache.spark.sql.Column) => element_at($"__mins", i + 1)
    val mx = (i: org.apache.spark.sql.Column) => element_at($"__maxs", i + 1)
    val codeAt = (i: org.apache.spark.sql.Column) =>
      when(mx(i) > mn(i),
        least(greatest(floor((v(i) - mn(i)) / (mx(i) - mn(i)) * lit(255.0)),
          lit(0.0)), lit(255.0)).cast("int") - 128).otherwise(0)
    val reconAt = (i: org.apache.spark.sql.Column) =>
      mn(i) + (codeAt(i).cast("double") + lit(128.5)) * (mx(i) - mn(i)) / lit(255.0)
    val diffAt = (i: org.apache.spark.sql.Column) =>
      when(mx(i) > mn(i), v(i) - reconAt(i)).otherwise(lit(0.0))
    val n = org.apache.spark.sql.functions.size($"embedding")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Int], Long)] =
      df.select($"id", $"codes", $"mse").as[(Long, Seq[Int], Option[Double])]
        .collect().toSeq.sortBy(_._1)
        .map { case (id, c, m) =>
          // bit-compare doubles so NaN==NaN and null is its own value
          (id, c, m.map(java.lang.Double.doubleToLongBits).getOrElse(Long.MinValue)) }
    val twin = adv.crossJoin(broadcast(packed))
      .select($"vec_id".as("id"),
        when(n > 0, transform(sequence(lit(0), n - 1), codeAt))
          .otherwise(typedLit(Seq.empty[Int])).as("codes"),
        when(n > 0, round(
          aggregate(transform(sequence(lit(0), n - 1), diffAt),
            lit(0.0), (acc, d) => acc + d * d) / n, 9)).as("mse"))
    val kernel = Quantization.int8Quantize(adv, "vec_id", "embedding")
    canon(kernel) shouldBe canon(twin)
    // and the quirks really are exercised
    val k = canon(kernel).map(r => r._1 -> r).toMap
    k(3L)._2.head shouldBe -128 // NaN elem -> floor NaN -> 0 -> -128
    assert(java.lang.Double.longBitsToDouble(k(3L)._3).isNaN)
    k(4L)._2.head shouldBe -128 // null elem -> -128
    k(4L)._3 shouldBe Long.MinValue // ...and a null MSE
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
