package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class BinningSpec extends SparkTestBase with Matchers {

  import spark.implicits._

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
}
