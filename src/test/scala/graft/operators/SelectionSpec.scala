package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Specs for the round-7 curation operators: deterministic epoch shuffling
  * (Export.shuffleShard), banded budget selection (Sampling.budgetSelect),
  * hard-negative mining (Similarity.hardNegatives) and source-level rollup
  * (Domains). */
class SelectionSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  describe("Export.shuffleShard") {
    def docs = (0L until 200L).toDF("id")

    it("addresses every row with a unique (shard, pos), pos contiguous from 1") {
      val out = Export.shuffleShard(docs, col("id"), nShards = 8).cache()
      out.count() shouldBe 200
      out.select("shard").distinct().count() shouldBe 8
      // per shard: pos = 1..count (dense, no gaps)
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
        .where(col("mx") =!= col("n") || col("mn") =!= 1)
      bad.count() shouldBe 0
      out.unpersist()
    }

    it("is deterministic for a fixed epoch and re-permutes across epochs") {
      val a1 = Export.shuffleShard(docs, col("id"), 8, epoch = 0)
        .select("id", "shard", "pos").collect().toSet
      val a2 = Export.shuffleShard(docs, col("id"), 8, epoch = 0)
        .select("id", "shard", "pos").collect().toSet
      a1 shouldBe a2
      val b = Export.shuffleShard(docs, col("id"), 8, epoch = 1)
        .select("id", "shard", "pos").collect().toSet
      b should not be a1
    }

    it("never plans a global single-partition sort — the window partitions by shard") {
      val p = Export.shuffleShard(docs, col("id"), 8)
        .queryExecution.executedPlan.toString()
      p shouldNot include("SinglePartition")
    }

    it("two-level banded pos is bit-identical to the single-window formulation " +
        "for any nBands and input partitioning") {
      // reference: the pre-banding shape — one window per shard
      val salted = concat(col("id").cast("string"), lit("_epoch_0"))
      val rank = Sampling.hashRank(salted)
      val shard = pmod(rank, lit(8L))
      val w = Window.partitionBy(shard).orderBy(rank.asc, col("id").cast("string").asc)
      val ref = docs.withColumn("shard", shard)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("id", "shard", "pos").collect().toSet
      for (bands <- Seq(1, 4, 64); parts <- Seq(1, 7)) {
        val got = Export.shuffleShard(docs.repartition(parts), col("id"),
            nShards = 8, epoch = 0, nBands = bands)
          .select("id", "shard", "pos").collect().toSet
        withClue(s"nBands=$bands parts=$parts: ") { got shouldBe ref }
      }
    }

    it("window parallelism is shards x bands, not one task per shard") {
      // the in-shard window must partition by (shard, band): a per-shard
      // window would make each shard one ~corpus/nShards sort task
      val p = Export.shuffleShard(docs, col("id"), nShards = 4, nBands = 64)
        .queryExecution.executedPlan.toString()
      p should include("__graft_band")
      // and the Window operator's partition spec carries BOTH columns
      val windowLines = p.linesIterator.filter(_.contains("Window ")).toSeq
      windowLines.exists(l =>
        l.contains("shard") && l.contains("__graft_band")) shouldBe true
    }
  }

  describe("Sampling.budgetSelect") {
    // cost/priority frame with duplicate priorities, a null priority and
    // priorities outside the declared band range
    def frame = Seq(
      (1L, 10L, 50.0), (2L, 10L, 50.0), (3L, 5L, 90.0), (4L, 20L, 90.0),
      (5L, 15L, 10.0), (6L, 30L, 150.0), (7L, 10L, -5.0), (8L, 25L, 70.0),
      (10L, 40L, 30.0), (11L, 1L, 30.0), (12L, 7L, 0.0)
    ).toDF("id", "cost", "pr")
      .union(Seq((9L, 12L)).toDF("id", "cost")
        .withColumn("pr", lit(null).cast("double"))
        .select("id", "cost", "pr"))

    def globalCum(budget: Long) = {
      val w = Window.orderBy(col("pr").desc_nulls_last, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      frame.withColumn("cum_cost", sum(col("cost")).over(w))
        .where(col("cum_cost") <= budget)
        .select("id", "cum_cost").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    it("matches the global-window cumsum exactly, ties / nulls / clamps included") {
      for (budget <- Seq(0L, 30L, 77L, 120L, 1000L); bands <- Seq(1, 3, 64)) {
        val got = Sampling.budgetSelect(frame, col("id"), col("cost"), col("pr"),
          budget, minPriority = 0.0, maxPriority = 100.0, nBands = bands)
          .select("id", "cum_cost").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got shouldBe globalCum(budget)
      }
    }

    it("broadcasts the band offsets — the data side shuffles only by band") {
      val p = Sampling.budgetSelect(frame, col("id"), col("cost"), col("pr"),
        100L, 0.0, 100.0, nBands = 8)
        .queryExecution.executedPlan.toString()
      p should include("BroadcastHashJoin")
      p shouldNot include("SortMergeJoin")
    }
  }

  describe("Similarity.hardNegatives") {
    def emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.5f, 0.5f), 2)
    ).toDF("vec_id", "embedding", "label")

    it("returns only label-mismatched neighbours, ranked by cosine") {
      val out = Similarity.hardNegatives(emb, emb.where(col("vec_id") === 1),
        "vec_id", "embedding", "label", k = 10)
        .orderBy(col("rank")).collect()
      out.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(3L, 5L, 4L)
      all(out.map(_.getAs[Int]("neighbor_label"))) should not be 0
      // nearest wrong-label vector first: vec 3 is closest to vec 1
      out.head.getAs[Long]("rank") shouldBe 1L
    }

    it("caps at k and never returns the query itself") {
      val out = Similarity.hardNegatives(emb, emb.where(col("vec_id") === 1),
        "vec_id", "embedding", "label", k = 2).collect()
      out.length shouldBe 2
      out.map(_.getAs[Long]("neighbor_id")) should not contain 1L
    }

    it("null-labeled queries produce no negatives") {
      val q = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
        .withColumn("label", lit(null).cast("int"))
      Similarity.hardNegatives(emb, q, "vec_id", "embedding", "label", 5)
        .count() shouldBe 0
    }
  }

  describe("Domains") {
    def docs = Seq(
      (1L, "aaaa", "s1"), (2L, "aaaa", "s1"), // corpus-wide dup pair
      (3L, "b" * 300, "s1"),
      (4L, "aaaa", "s2"), // dup of s1's text — corpus-wide, cross-source
      (5L, "c" * 500, "s2")
    ).toDF("doc_id", "text", "source")

    it("computes per-source dup/short shares against the WHOLE corpus") {
      val rows = Domains.sourceStats(docs, "doc_id", "text", "source", shortLen = 100)
        .orderBy("source").collect()
      val s1 = rows(0)
      s1.getAs[Long]("n_docs") shouldBe 3
      s1.getAs[Double]("dup_frac") shouldBe (2.0 / 3 +- 1e-6) // docs 1,2
      s1.getAs[Double]("short_frac") shouldBe (2.0 / 3 +- 1e-6)
      val s2 = rows(1)
      s2.getAs[Double]("dup_frac") shouldBe 0.5 +- 1e-6 // doc 4 dups corpus-wide
    }

    it("joins the score back to every doc via broadcast") {
      val out = Domains.withSourceScore(docs, "doc_id", "text", "source")
      out.count() shouldBe 5
      out.columns should contain("source_score")
      out.queryExecution.executedPlan.toString() should include("BroadcastHashJoin")
    }
  }
}
