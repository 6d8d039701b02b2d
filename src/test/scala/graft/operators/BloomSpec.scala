package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class BloomSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("bloom-pruned join") {

    it("equals the plain join for single and composite keys") {
      val large = spark.range(20000)
        .select((col("id") % 5000).as("k"), (col("id") % 11).as("k2"), col("id").as("v"))
      val small = Seq((3L, 3L, "a"), (17L, 6L, "b"), (4999L, 3L, "c"), (123L, 2L, "d"))
        .toDF("k", "k2", "name")

      val plain1 = large.join(small.select("k", "name").distinct(), Seq("k"))
      val pruned1 = Bloom.bloomPrunedJoin(large, Seq("k"),
        small.select("k", "name").distinct(), Seq("k"))
      pruned1.as[(Long, Long, Long, String)].collect().sorted shouldBe
        plain1.as[(Long, Long, Long, String)].collect().sorted

      val plain2 = large.join(small, Seq("k", "k2")).count()
      Bloom.bloomPrunedJoin(large, Seq("k", "k2"), small, Seq("k", "k2"))
        .count() shouldBe plain2
    }

    it("handles differently-named keys and left_semi") {
      val large = spark.range(1000).select(col("id").as("l_key"), col("id").as("v"))
      val small = Seq(1L, 5L, 999L).toDF("r_key")
      val semi = Bloom.bloomPrunedJoin(large, Seq("l_key"), small, Seq("r_key"),
        joinType = "left_semi")
      semi.select("l_key").as[Long].collect().sorted shouldBe Array(1L, 5L, 999L)
      semi.columns should contain theSameElementsAs Seq("l_key", "v")
    }

    it("prunes the large side before the shuffle (few rows pass the sketch)") {
      val large = spark.range(100000).select(col("id").as("k"), col("id").as("v"))
      val small = Seq(7L, 42L, 99999L).toDF("k")
      // measure the prune alone: replicate the operator's internals
      val filter = small.select(xxhash64(col("k")).as("_graft_bloom_key"))
        .stat.bloomFilter("_graft_bloom_key", 3, 0.01)
      val bc = spark.sparkContext.broadcast(filter)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      val surviving = large.where(mightContain(xxhash64(col("k")))).count()
      // 3 true keys + ~1% fpp of 100k = ~1000; far below the unpruned 100k
      surviving should be < 5000L
      surviving should be >= 3L
      // and the full operator still returns the exact join
      Bloom.bloomPrunedJoin(large, Seq("k"), small, Seq("k"))
        .count() shouldBe 3L
    }

    it("rejects bad arguments") {
      val df = spark.range(1).toDF("k")
      an[IllegalArgumentException] should be thrownBy
        Bloom.bloomPrunedJoin(df, Seq.empty, df, Seq.empty)
      an[IllegalArgumentException] should be thrownBy
        Bloom.bloomPrunedJoin(df, Seq("k"), df, Seq("k"), fpp = 1.5)
    }

    it("refuses join types whose unmatched rows the prune would lose") {
      val df = spark.range(1).toDF("k")
      an[IllegalArgumentException] should be thrownBy
        Bloom.bloomPrunedJoin(df, Seq("k"), df, Seq("k"), joinType = "left")
      an[IllegalArgumentException] should be thrownBy
        Bloom.bloomPrunedJoin(df, Seq("k"), df, Seq("k"), joinType = "full_outer")
    }
  }
}
