package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "a completely different set of tokens entirely here"),
    (2L, "quick brown fox appears again in this doc"), // shares "quick brown fox"
    (3L, "short doc")).toDF("doc_id", "text")

  private val bench = Seq(
    (100L, "the quick brown fox is a benchmark sentence")).toDF("bid", "btext")

  describe("decontaminate") {

    it("flags docs sharing an n-gram with the benchmark and counts hits") {
      val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 3)
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
      val byId = out.map(r => r._1 -> r).toMap
      // doc 0 shares "the quick brown" and "quick brown fox"
      byId(0L)._3 shouldBe 2L
      byId(0L)._4 shouldBe true
      byId(1L)._3 shouldBe 0L
      byId(1L)._4 shouldBe false
      // doc 2 shares only "quick brown fox"
      byId(2L)._3 shouldBe 1L
      byId(2L)._4 shouldBe true
      // every doc appears exactly once, hit or not
      out.map(_._1) shouldBe Array(0L, 1L, 2L, 3L)
    }

    it("respects a nonzero maxHits tolerance") {
      val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext",
        n = 3, maxHits = 1L)
        .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r._4).toMap
      out(0L) shouldBe true  // 2 hits > 1
      out(2L) shouldBe false // 1 hit <= 1
    }

    it("short docs gram to a single window without erroring") {
      val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 3)
        .where(col("doc_id") === 3L)
        .as[(Long, Long, Long, Boolean)].head()
      out._2 shouldBe 1L // "short doc" -> one (clamped) gram
      out._4 shouldBe false
    }

    it("blank text has zero grams: a blank bench row cannot poison blank docs") {
      val blankyCorpus = Seq((0L, ""), (1L, "   "), (2L, "the quick brown fox"))
        .toDF("doc_id", "text")
      val blankyBench = Seq((100L, ""), (101L, "quick brown fox here"))
        .toDF("bid", "btext")
      val out = Dedup.decontaminate(blankyCorpus, "doc_id", "text",
        blankyBench, "btext", n = 3)
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
      // blank docs still appear, with no grams and no hits
      out(0) shouldBe ((0L, 0L, 0L, false))
      out(1) shouldBe ((1L, 0L, 0L, false))
      // the real doc matches "quick brown fox" only
      out(2)._3 shouldBe 1L
      out(2)._4 shouldBe true
    }

    it("benchmark side is broadcast — no corpus-wide join shuffle") {
      val plan = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 3)
        .queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
    }
  }
}
