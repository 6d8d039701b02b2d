package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The persisted IVF index: storage round-trip fidelity (query == the
  * in-session operator when trained on the same corpus), snapshot
  * isolation, and PK replacement on re-ingest. */
class AnnIndexSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def vectors(n: Int, dim: Int = 8, shift: Double = 0.0) =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(d => math.sin(i * 31 + d * 7) + shift))
    }.toDF("vec_id", "embedding")

  it("round-trips through storage: persisted query equals the in-session operator") {
    val base = s"$tmpDir/ann_roundtrip"
    val corpus = vectors(120)
    AnnIndex.buildIvf(spark, base, corpus, "vec_id", "embedding",
      nLists = 4, lloydIters = 2, ts("2024-01-01 00:00:00"))
    val persisted = AnnIndex.queryIvf(spark, base, corpus.where($"vec_id" < 5),
        "vec_id", "embedding", k = 3, nProbe = 2, ts("2024-06-01 00:00:00"))
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val inSession = Similarity.ivfTopK(corpus, corpus.where($"vec_id" < 5),
        "vec_id", "embedding", k = 3, nLists = 4, lloydIters = 2, nProbe = 2)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    persisted shouldBe inSession
    persisted.length should be > 0
  }

  it("isolates snapshots: a query as of day 1 never sees day-2 vectors") {
    val base = s"$tmpDir/ann_asof"
    AnnIndex.buildIvf(spark, base, vectors(60), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts("2024-01-01 00:00:00"))
    AnnIndex.appendVectors(spark, base,
      vectors(120).where($"vec_id" >= 60), "vec_id", "embedding",
      ts("2024-01-02 00:00:00"))
    val day1 = AnnIndex.queryIvf(spark, base, vectors(60).where($"vec_id" < 3),
        "vec_id", "embedding", k = 50, nProbe = 2, ts("2024-01-01 12:00:00"))
      .select($"neighbor_id").as[Long].collect()
    day1.forall(_ < 60) shouldBe true
    val day2 = AnnIndex.queryIvf(spark, base, vectors(60).where($"vec_id" < 3),
        "vec_id", "embedding", k = 200, nProbe = 2, ts("2024-06-01 00:00:00"))
      .select($"neighbor_id").as[Long].collect()
    day2.exists(_ >= 60) shouldBe true
  }

  it("replaces a re-ingested vector id instead of duplicating it") {
    val base = s"$tmpDir/ann_replace"
    AnnIndex.buildIvf(spark, base, vectors(40), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts("2024-01-01 00:00:00"))
    // vec 7 re-ingested with a shifted embedding
    AnnIndex.appendVectors(spark, base,
      vectors(40, shift = 2.5).where($"vec_id" === 7), "vec_id", "embedding",
      ts("2024-01-02 00:00:00"))
    val hits = AnnIndex.queryIvf(spark, base, vectors(40).where($"vec_id" === 0),
        "vec_id", "embedding", k = 100, nProbe = 2, ts("2024-06-01 00:00:00"))
      .where($"neighbor_id" === 7).count()
    hits should be <= 1L // PK snapshot: one row for vec 7, never two
  }
}
