package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class DedupIndexSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // a tiny corpus with engineered near-dups across batches: 10/11 share a
  // long prefix with 0/1, 12 is unique
  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (2L, "completely different content about distributed query engines"),
    (3L, "yet another unrelated document mentioning parquet and shuffles"),
    (10L, "the quick brown fox jumps over the lazy dog again and again today"),
    (11L, "the quick brown fox jumps over the lazy dog again and again yesterday"),
    (12L, "nothing like the others entirely novel text body right here")
  ).toDF("doc_id", "text")

  it("two append cycles then dedupAgainst matches the in-session cross pairs") {
    val base = java.nio.file.Files.createTempDirectory("dedup-index").toString
    val t0 = DedupIndex.openOrCreate(spark, base)
    val t1 = DedupIndex.indexBatch(t0, corpus.where($"doc_id" < 2),
      "doc_id", "text", ts("2024-01-01 00:00:00"))
    val t2 = DedupIndex.indexBatch(t1, corpus.where($"doc_id" >= 2 && $"doc_id" < 10),
      "doc_id", "text", ts("2024-01-02 00:00:00"))

    val batch = corpus.where($"doc_id" >= 10)
    val viaIndex = DedupIndex.dedupAgainst(t2, ts("2024-06-01 00:00:00"), batch,
      "doc_id", "text", threshold = 0.5)
      .select($"id_new", $"id_idx", $"est_jaccard")
      .as[(Long, Long, Double)].collect().toSet

    // ground truth: the one-shot self-join over the full corpus, restricted
    // to (new batch, indexed) pairs
    val direct = Dedup.minHashLshPairs(corpus, "doc_id", "text", threshold = 0.5)
      .where(col("id_b") >= 10 && col("id_a") < 10)
      .select(col("id_b"), col("id_a"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet

    viaIndex shouldBe direct
    viaIndex.map(p => (p._1, p._2)) shouldBe Set((10L, 0L), (10L, 1L), (11L, 0L), (11L, 1L))
  }

  it("re-indexed docs replace their signature via PK snapshot semantics") {
    val base = java.nio.file.Files.createTempDirectory("dedup-index2").toString
    val t0 = DedupIndex.openOrCreate(spark, base)
    val t1 = DedupIndex.indexBatch(t0, corpus.where($"doc_id" === 0),
      "doc_id", "text", ts("2024-01-01 00:00:00"))
    // doc 0 is re-crawled with fresh content that no longer matches 10
    val recrawled = Seq((0L, "doc zero got replaced with brand new words"))
      .toDF("doc_id", "text")
    val t2 = DedupIndex.indexBatch(t1, recrawled, "doc_id", "text",
      ts("2024-01-05 00:00:00"))

    val batch = corpus.where($"doc_id" === 10)
    // as of AFTER the re-crawl: latest signature wins, no pair
    DedupIndex.dedupAgainst(t2, ts("2024-06-01 00:00:00"), batch,
      "doc_id", "text").count() shouldBe 0L
    // as of BEFORE the re-crawl: the original signature is the live one
    DedupIndex.dedupAgainst(t2, ts("2024-01-02 00:00:00"), batch,
      "doc_id", "text").count() shouldBe 1L
  }

  it("dedup against an empty index yields no pairs but a typed frame") {
    val base = java.nio.file.Files.createTempDirectory("dedup-index3").toString
    val t0 = DedupIndex.openOrCreate(spark, base)
    val out = DedupIndex.dedupAgainst(t0, ts("2024-06-01 00:00:00"),
      corpus.where($"doc_id" >= 10), "doc_id", "text")
    out.columns.toSeq shouldBe Seq("id_new", "id_idx", "est_jaccard")
    out.count() shouldBe 0L
  }
}
