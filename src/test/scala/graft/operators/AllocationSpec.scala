package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class AllocationSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val corpus = Seq.tabulate(1000) { i =>
    val src = if (i < 700) "big" else if (i < 950) "mid" else "tiny"
    (i.toLong, src, 100L) // uniform per-doc cost: masses 70k / 25k / 5k
  }.toDF("doc_id", "source", "cost")

  describe("temperatureAllocate") {
    def alloc(budget: Long) =
      Sampling.temperatureAllocate(corpus, "source", $"cost", budget)
        .select($"source", $"total_cost", $"alloc", $"rate")
        .as[(String, Long, Long, Double)].collect().toSeq

    it("allocations sum to exactly the budget (largest-remainder apportionment)") {
      Seq(1L, 7L, 999L, 20000L, 33333L).foreach { b =>
        alloc(b).map(_._3).sum shouldBe b
      }
    }

    it("sqrt temperature up-weights small sources relative to proportional") {
      val a = alloc(30000L).map(r => r._1 -> r).toMap
      // proportional shares would be 70%/25%/5%; sqrt flattens toward equal
      val bigShare = a("big")._3.toDouble / 30000
      val tinyShare = a("tiny")._3.toDouble / 30000
      bigShare should be < 0.70
      tinyShare should be > 0.05
      // ...but never inverts the ordering
      a("big")._3 should be > a("mid")._3
      a("mid")._3 should be > a("tiny")._3
      // the sampling RATE is monotone the other way: tiny oversampled
      a("tiny")._4 should be > a("mid")._4
      a("mid")._4 should be > a("big")._4
    }

    it("is deterministic across repartitionings") {
      val shuffled = Sampling.temperatureAllocate(
        corpus.repartition(7, $"doc_id"), "source", $"cost", 12345L)
        .select($"source", $"alloc").as[(String, Long)].collect().toSeq.sorted
      val plain = Sampling.temperatureAllocate(corpus, "source", $"cost", 12345L)
        .select($"source", $"alloc").as[(String, Long)].collect().toSeq.sorted
      shuffled shouldBe plain
    }
  }

  describe("keySkewProfile") {
    it("ranks hot keys first with exact shares and skew ratios") {
      val df = (Seq.fill(60)("hot") ++ (1 to 20).map(i => s"k$i") ++
        Seq.fill(20)("warm")).toDF("k")
      val prof = Profile.keySkewProfile(df, "k", topK = 2)
        .as[(String, Long, Double, Double)].collect().toSeq
      prof.map(_._1) shouldBe Seq("hot", "warm")
      prof.head._2 shouldBe 60L
      prof.head._3 shouldBe 0.6 // 60 of 100 rows
      prof.head._4 shouldBe 13.2 // 60 / (100/22 keys)
    }

    it("counts nulls as a real key") {
      val df = Seq(Some("a"), None, None, None).toDF("k")
      val prof = Profile.keySkewProfile(df, "k", topK = 1)
        .select($"key_value", $"n_rows").as[(Option[String], Long)].collect()
      prof.head._2 shouldBe 3L
      prof.head._1 shouldBe None // null key surfaces as null, not dropped
    }
  }
}
