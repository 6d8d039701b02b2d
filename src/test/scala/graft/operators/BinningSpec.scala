package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class BinningSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("histogram") {

    it("buckets with width_bucket semantics and zero-fills empty bins") {
      // [0, 10) in 5 bins of width 2: -1 -> 0 (underflow), 10/11 -> 6
      // (overflow), boundary 2.0 -> upper bin 2 (half-open bins)
      val df = Seq(-1.0, 0.0, 0.5, 2.0, 9.9, 10.0, 11.0).toDF("v")
      val out = Binning.histogram(df, "v", lo = 0.0, hi = 10.0, nBins = 5)
        .orderBy("bin")
        .select("bin", "n").as[(Long, Long)].collect()
      out shouldBe Array(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 0L,
        5L -> 1L, 6L -> 2L)
    }

    it("ignores nulls and reports per-bin min/max") {
      val df = Seq[Option[Double]](Some(1.0), Some(1.5), None, Some(3.0))
        .toDF("v")
      val rows = Binning.histogram(df, "v", 0.0, 4.0, 2)
        .orderBy("bin")
        .select("bin", "n", "bin_min", "bin_max")
        .as[(Long, Long, Option[Double], Option[Double])].collect()
      rows(1) shouldBe (1L, 2L, Some(1.0), Some(1.5))
      rows(2) shouldBe (2L, 1L, Some(3.0), Some(3.0))
      rows(0)._2 shouldBe 0L // empty underflow bin present with n=0
      an[IllegalArgumentException] should be thrownBy
        Binning.histogram(df, "v", 5.0, 5.0, 2)
    }
  }

  describe("histogramBy") {
    it("zero-fills per group and counts independently") {
      val df = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0)).toDF("g", "v")
      val out = Binning.histogramBy(df, "g", "v", lo = 0.0, hi = 4.0, nBins = 2)
        .orderBy("group", "bin")
        .as[(String, Long, Long)].collect()
      out.length shouldBe 8 // 2 groups x (2 bins + under/overflow)
      out.filter(_._1 == "a").map(_._3) shouldBe Array(0L, 1L, 1L, 0L)
      out.filter(_._1 == "b").map(_._3) shouldBe Array(0L, 1L, 0L, 0L)
    }
  }

  describe("equiDepth") {

    it("produces near-equal bin occupancy on skewed data") {
      // heavily skewed: exponential-ish via id^2
      val df = spark.range(4000).select((col("id") * col("id")).cast("double").as("v"))
      val counts = Binning.equiDepth(df, "v", nBins = 4)
        .groupBy("bin").count().as[(Long, Long)].collect().toMap
      counts.keySet shouldBe Set(0L, 1L, 2L, 3L)
      counts.values.foreach(_.toDouble shouldBe 1000.0 +- 30.0)
    }

    it("ties at a boundary land in the lower bin, deterministically") {
      val df = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0).toDF("v")
      val bounds = Binning.equiDepthBoundaries(df, "v", 2)
      // median of (1,2,2,2,3,4) = 2.0: every tied 2.0 is NOT above it
      bounds shouldBe Seq(2.0)
      val out = Binning.equiDepth(df, "v", 2)
        .as[(Double, Long)].collect().sortBy(_._1)
      out.filter(_._1 == 2.0).map(_._2).toSet shouldBe Set(0L)
      out.filter(_._1 > 2.0).map(_._2).toSet shouldBe Set(1L)
    }

    it("is stable under repartitioning and guards the bin column name") {
      val df = spark.range(1000).select(col("id").cast("double").as("v"))
      val a = Binning.equiDepth(df, "v", 5).as[(Double, Long)].collect().sortBy(_._1)
      val b = Binning.equiDepth(df.repartition(7), "v", 5)
        .as[(Double, Long)].collect().sortBy(_._1)
      b shouldBe a
      an[IllegalArgumentException] should be thrownBy
        Binning.equiDepth(df.withColumn("bin", lit(1)), "v", 5)
      an[IllegalArgumentException] should be thrownBy
        Binning.equiDepth(df, "v", 1)
    }
  }

  describe("approxQuantiles") {

    it("interpolates within one bin width of the exact quantile on a ramp") {
      val df = (0 until 1000).map(_.toDouble).toDF("v")
      val est = Binning.approxQuantiles(df, "v", Seq(0.5, 0.9, 0.99), nBins = 100)
        .select($"q", $"estimate").as[(Double, Double)].collect().toMap
      val binWidth = 999.0 / 100
      math.abs(est(0.5) - 499.5) should be <= binWidth
      math.abs(est(0.9) - 899.1) should be <= binWidth
      math.abs(est(0.99) - 989.01) should be <= binWidth
    }

    it("estimates stay inside [lo, hi] and are monotone in q") {
      val df = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0).toDF("v")
      val est = Binning.approxQuantiles(df, "v", Seq(0.1, 0.5, 0.9), nBins = 4)
        .orderBy($"q").select($"estimate").as[Double].collect().toSeq
      all(est) should (be >= 1.0 and be <= 9.0)
      est shouldBe est.sorted
    }

    it("a constant column estimates the constant at every quantile") {
      val df = Seq.fill(10)(7.5).toDF("v")
      val est = Binning.approxQuantiles(df, "v", Seq(0.5, 0.99), nBins = 8)
        .select($"estimate").as[Double].collect().toSeq
      est shouldBe Seq(7.5, 7.5)
    }

    it("is invariant to partitioning (the bin counts are a linear sketch)") {
      val vals = (0 until 500).map(i => (i * 37 % 101).toDouble)
      val one = Binning.approxQuantiles(vals.toDF("v").coalesce(1), "v",
        Seq(0.5, 0.95), nBins = 32).select($"q", $"estimate")
        .as[(Double, Double)].collect().toSeq.sorted
      val many = Binning.approxQuantiles(vals.toDF("v").repartition(7), "v",
        Seq(0.5, 0.95), nBins = 32).select($"q", $"estimate")
        .as[(Double, Double)].collect().toSeq.sorted
      one shouldBe many
    }
  }
}
