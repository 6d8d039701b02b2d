package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class PackingSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  // (id, shard, tokens): shard a fills 10+200+300 tokens, shard b 50+512
  private val docs = Seq(
    (1L, "a", 10L), (2L, "a", 200L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "b", 512L)).toDF("id", "shard", "toks")

  describe("packSequences") {

    it("assigns contiguous offsets and window-of-first-token chunk ids per shard") {
      val out = Packing.packSequences(docs, Seq(col("shard")), col("id"),
        col("toks"), windowTokens = 512L)
        .select("id", "start_offset", "chunk_id", "spans_boundary")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
      out shouldBe Array(
        (1L, 0L, 0L, false),
        (2L, 10L, 0L, false),
        (3L, 210L, 0L, false),   // 210+300=510 <= 512: fits window 0
        (4L, 0L, 0L, false),     // shard b restarts at 0
        (5L, 50L, 0L, true))     // 50+512 crosses into window 1
    }

    it("the stream layout is deterministic under repartitioning") {
      val big = spark.range(10000).select(col("id"), (col("id") % 7).as("shard"),
        (col("id") % 97 + 1).as("toks"))
      val a = Packing.packSequences(big, Seq(col("shard")), col("id"), col("toks"), 2048L)
        .select("id", "start_offset", "chunk_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      val b = Packing.packSequences(big.repartition(13), Seq(col("shard")),
        col("id"), col("toks"), 2048L)
        .select("id", "start_offset", "chunk_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      b shouldBe a
      // offsets within each shard are gapless: sum of tokens == max end offset
      val totals = big.groupBy("shard").agg(sum("toks")).as[(Long, Long)].collect().toMap
      a.groupBy(r => r._1 % 7).foreach { case (shard, rows) =>
        val last = rows.maxBy(_._2)
        last._2 + (last._1 % 97 + 1) shouldBe totals(shard)
      }
    }

    it("packs in a single window shuffle") {
      val plan = Packing.packSequences(docs, Seq(col("shard")), col("id"),
        col("toks"), 512L).queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(plan).size shouldBe 1
    }

    it("rejects non-positive windows, empty sharding and reserved input columns") {
      an[IllegalArgumentException] should be thrownBy
        Packing.packSequences(docs, Seq(col("shard")), col("id"), col("toks"), 0L)
      an[IllegalArgumentException] should be thrownBy
        Packing.packSequences(docs, Seq.empty, col("id"), col("toks"), 512L)
      an[IllegalArgumentException] should be thrownBy
        Packing.packSequences(docs.withColumn("chunk_id", lit(1)),
          Seq(col("shard")), col("id"), col("toks"), 512L)
    }

    it("tied order values become deterministic with a tieBreak; null tokens pack as zero") {
      val tied = Seq((1L, "a", "t0", Some(10L)), (2L, "a", "t0", None),
        (3L, "a", "t0", Some(5L))).toDF("id", "shard", "at", "toks")
      def run(df: org.apache.spark.sql.DataFrame) =
        Packing.packSequences(df, Seq(col("shard")), col("at"), col("toks"),
          512L, tieBreak = Seq(col("id")))
          .select("id", "n_tokens", "start_offset")
          .as[(Long, Long, Long)].collect().sortBy(_._1)
      val a = run(tied)
      val b = run(tied.repartition(5))
      b shouldBe a
      a shouldBe Array((1L, 10L, 0L), (2L, 0L, 10L), (3L, 5L, 10L))
    }
  }

  describe("lengthBucketedBatches") {
    it("cuts sorted fixed-count batches per shard and accounts padding waste") {
      // shard x: lengths 1..5 -> batches [1,2] [3,4] [5]; shard y: [7,9]
      val docs = Seq((1L, "x", 3L), (2L, "x", 1L), (3L, "x", 5L),
        (4L, "x", 2L), (5L, "x", 4L), (6L, "y", 9L), (7L, "y", 7L))
        .toDF("id", "shard", "toks")
      val out = Packing.lengthBucketedBatches(docs, Seq(col("shard")),
          col("toks"), col("id"), batchSize = 2)
        .select("shard", "batch_idx", "n_docs", "max_tokens", "padding_waste")
        .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      out shouldBe Array(
        ("x", 0L, 2L, 2L, 1L), // [1,2]: padded to 2, waste 1
        ("x", 1L, 2L, 4L, 1L), // [3,4]
        ("x", 2L, 1L, 5L, 0L), // [5] alone
        ("y", 0L, 2L, 9L, 2L)) // [7,9]
    }

    it("is partitioning-invariant given the tie-break") {
      val docs = (1L to 40L).map(i => (i, "s", i % 7)).toDF("id", "shard", "toks")
      def run(df: org.apache.spark.sql.DataFrame) =
        Packing.lengthBucketedBatches(df, Seq(col("shard")), col("toks"),
          col("id"), batchSize = 8)
          .select("batch_idx", "n_docs", "max_tokens", "sum_tokens")
          .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      run(docs.repartition(7)) shouldBe run(docs)
    }
  }
}
