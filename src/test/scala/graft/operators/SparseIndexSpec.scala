package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SparseIndexSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val queries = Seq((1L, "spark join"), (2L, "window"))
    .toDF("query_id", "qtext")

  private def retrieveAsOf(table: graft.storage.AuditTable, asOf: Timestamp) =
    Ranking.bm25Retrieve(SparseIndex.bm25IndexAsOf(table, asOf),
        queries, "query_id", "qtext", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def batchTopK(corpus: org.apache.spark.sql.DataFrame) =
    Ranking.bm25TopK(corpus, "doc_id", "text", queries, "query_id", "qtext", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  it("incremental ingest retrieves bit-identically to batch BM25 over the live corpus") {
    val base = s"$tmpDir/sparse1"
    val b1 = Seq(
      (0L, "spark shuffle join join"),
      (1L, "window filter scan"),
      (2L, "")).toDF("doc_id", "text") // empty doc: no postings, counts in N
    val b2 = Seq(
      (3L, "spark spark window"),
      // doc 0 REPLACED: 'join' dropped entirely, 'window' gained
      (0L, "spark window window")).toDF("doc_id", "text")
    val t0 = SparseIndex.openOrCreate(spark, base)
    val t1 = SparseIndex.indexBatch(t0, b1, "doc_id", "text", ts("2024-01-01 00:00:00"))
    val t2 = SparseIndex.indexBatch(t1, b2, "doc_id", "text", ts("2024-01-02 00:00:00"))

    // live corpus after day 2 = docs 1,2,3 + doc 0's NEW text
    val live = Seq(
      (0L, "spark window window"),
      (1L, "window filter scan"),
      (2L, ""),
      (3L, "spark spark window")).toDF("doc_id", "text")
    retrieveAsOf(t2, ts("2024-01-03 00:00:00")) shouldBe batchTopK(live)

    // stale-posting safety: 'join' retrieves NOTHING now — doc 0's old
    // posting list was replaced wholesale, not merged term-by-term
    val joinHits = Ranking.bm25Retrieve(
        SparseIndex.bm25IndexAsOf(t2, ts("2024-01-03 00:00:00")),
        Seq((9L, "join")).toDF("query_id", "qtext"), "query_id", "qtext", k = 5)
      .count()
    joinHits shouldBe 0L

    // time travel: as of day 1 the index serves the ORIGINAL corpus
    val day1 = Seq(
      (0L, "spark shuffle join join"),
      (1L, "window filter scan"),
      (2L, "")).toDF("doc_id", "text")
    retrieveAsOf(t2, ts("2024-01-01 12:00:00")) shouldBe batchTopK(day1)
  }

  it("conflicting texts for one doc_id in a batch fail loudly; identical repeats collapse") {
    val base = s"$tmpDir/sparse3"
    val t0 = SparseIndex.openOrCreate(spark, base)
    // byte-identical repeat: harmless, one posting row
    val t1 = SparseIndex.indexBatch(t0,
      Seq((0L, "spark join"), (0L, "spark join")).toDF("doc_id", "text"),
      "doc_id", "text", ts("2024-01-01 00:00:00"))
    SparseIndex.bm25IndexAsOf(t1, ts("2024-01-02 00:00:00"))
      .select("doc_id").distinct().count() shouldBe 1L
    // conflicting versions: neither is "latest" within a batch
    val ex = intercept[Exception] {
      SparseIndex.indexBatch(t1,
        Seq((5L, "version one"), (5L, "version two")).toDF("doc_id", "text"),
        "doc_id", "text", ts("2024-01-03 00:00:00"))
    }
    ex.getMessage should include("conflicting texts")
    // a NULL text is its own version: (id, text) + (id, null) must ALSO
    // fail loudly — countDistinct alone skips nulls and would silently
    // index the non-null version. (Fresh handle: the failed append above
    // consumed the one-shot t1.)
    val ex2 = intercept[Exception] {
      SparseIndex.indexBatch(SparseIndex.openOrCreate(spark, base),
        Seq((6L, Some("version one")), (6L, Option.empty[String]))
          .toDF("doc_id", "text"),
        "doc_id", "text", ts("2024-01-04 00:00:00"))
    }
    ex2.getMessage should include("conflicting texts")
  }

  it("retrieve-side df pruning matches the batch operator's cap and pushes to the scan") {
    val base = s"$tmpDir/sparse5"
    // "the" present in all 4 docs (df fraction 1.0); others rarer
    val corpus = Seq(
      (0L, "the spark shuffle join"),
      (1L, "the spark spark"),
      (2L, "the window filter"),
      (3L, "the quick fox")).toDF("doc_id", "text")
    val t1 = SparseIndex.indexBatch(SparseIndex.openOrCreate(spark, base),
      corpus, "doc_id", "text", ts("2024-01-01 00:00:00"))
    val idx = SparseIndex.bm25IndexAsOf(t1, ts("2024-01-02 00:00:00"))
    // the persisted index carries df so the prune is a plain scan predicate
    idx.columns should contain("df")
    val qs = Seq((1L, "the spark join")).toDF("query_id", "qtext")
    val got = Ranking.bm25Retrieve(idx, qs, "query_id", "qtext",
        k = 4, maxDfFraction = 0.9)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    val want = Ranking.bm25TopK(corpus, "doc_id", "text", qs,
        "query_id", "qtext", k = 4, maxDfFraction = 0.9)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    got shouldBe want
    // the hot term is gone: docs sharing only "the" with the query vanish
    got.map(_._3).toSet shouldBe Set(0L, 1L)
    // an index built without df support refuses the cap loudly
    val bare = idx.drop("df")
    val ex = intercept[IllegalArgumentException] {
      Ranking.bm25Retrieve(bare, qs, "query_id", "qtext", k = 4,
        maxDfFraction = 0.5)
    }
    ex.getMessage should include("df")
  }

  it("an asOf earlier than every append fails loudly instead of serving an empty index") {
    val base = s"$tmpDir/sparse4"
    val t1 = SparseIndex.indexBatch(SparseIndex.openOrCreate(spark, base),
      Seq((0L, "spark")).toDF("doc_id", "text"),
      "doc_id", "text", ts("2024-06-01 00:00:00"))
    val ex = intercept[IllegalStateException] {
      SparseIndex.bm25IndexAsOf(t1, ts("2023-01-01 00:00:00"))
    }
    ex.getMessage should include("no indexed documents at or before")
  }

  it("token-less documents hold no postings but still count toward N and avgdl") {
    val base = s"$tmpDir/sparse2"
    val t1 = SparseIndex.indexBatch(SparseIndex.openOrCreate(spark, base),
      Seq((0L, "spark join"), (1L, "")).toDF("doc_id", "text"),
      "doc_id", "text", ts("2024-01-01 00:00:00"))
    val idx = SparseIndex.bm25IndexAsOf(t1, ts("2024-01-02 00:00:00"))
    idx.select("doc_id").distinct().as[Long].collect().toSet shouldBe Set(0L)
    // scores equal the batch operator's over the SAME two-doc corpus —
    // wrong if the empty doc were dropped from N/avgdl
    Ranking.bm25Retrieve(idx, Seq((1L, "spark")).toDF("query_id", "qtext"),
        "query_id", "qtext", k = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq shouldBe
      Ranking.bm25TopK(Seq((0L, "spark join"), (1L, "")).toDF("doc_id", "text"),
        "doc_id", "text", Seq((1L, "spark")).toDF("query_id", "qtext"),
        "query_id", "qtext", k = 2)
        .as[(Long, Long, Long, Double)].collect().toSeq
  }
}
