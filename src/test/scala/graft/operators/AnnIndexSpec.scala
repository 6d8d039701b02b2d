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

  it("rejects a rebuild into an existing basePath — generations would mix") {
    // PK-latest-wins snapshots cannot delete: a second build with fewer
    // cells would leave the old generation's higher cell ids (and codes
    // for un-reindexed vec_ids) live — silently wrong probes
    val base = s"$tmpDir/ann_rebuild"
    AnnIndex.buildIvf(spark, base, vectors(40), "vec_id", "embedding",
      nLists = 4, lloydIters = 1, ts("2024-01-01 00:00:00"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.buildIvf(spark, base, vectors(40), "vec_id", "embedding",
        nLists = 2, lloydIters = 1, ts("2024-02-01 00:00:00"))
    }
    ex.getMessage should include("fresh basePath")
    val ex2 = intercept[IllegalArgumentException] {
      AnnIndex.buildIvfPq(spark, base, vectors(40), "vec_id", "embedding",
        nLists = 2, lloydIters = 1, ts = ts("2024-02-01 00:00:00"))
    }
    ex2.getMessage should include("fresh basePath")
  }

  it("skips null query vectors instead of failing the probe") {
    val base = s"$tmpDir/ann_nullq"
    AnnIndex.buildIvf(spark, base, vectors(40), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts("2024-01-01 00:00:00"))
    val queries = Seq((0L, Some(Seq.tabulate(8)(d => math.sin(d * 7.0)))),
      (1L, None)).toDF("vec_id", "embedding")
    val out = AnnIndex.queryIvf(spark, base, queries, "vec_id", "embedding",
      k = 3, nProbe = 1, ts("2024-06-01 00:00:00"))
    out.select("query_id").distinct().as[Long].collect() shouldBe Array(0L)
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

  it("PQ index round-trips: persisted ADC query equals the in-session IVF-PQ operator") {
    val base = s"$tmpDir/annpq_roundtrip"
    val corpus = vectors(120)
    AnnIndex.buildIvfPq(spark, base, corpus, "vec_id", "embedding",
      nLists = 4, lloydIters = 2, m = 4, codesPerSubspace = 8, pqIters = 1,
      ts = ts("2024-01-01 00:00:00"))
    val persisted = AnnIndex.queryIvfPq(spark, base,
        corpus.where($"vec_id" < 5), "vec_id", "embedding",
        k = 3, nProbe = 2, ts("2024-06-01 00:00:00"))
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val inSession = Quantization.ivfPqTopK(corpus, corpus.where($"vec_id" < 5),
        "vec_id", "embedding", dim = 8, k = 3, nLists = 4, coarseIters = 2,
        nProbe = 2, m = 4, codesPerSubspace = 8, pqIters = 1)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    persisted shouldBe inSession
    persisted.length should be > 0
  }

  it("PQ index stores codes only — no vector column reaches the codes table") {
    val base = s"$tmpDir/annpq_codesonly"
    AnnIndex.buildIvfPq(spark, base, vectors(60), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts = ts("2024-01-01 00:00:00"))
    val cols = graft.storage.Storage
      .openTable(spark, base, AnnIndex.PqCodesTable).get
      .snapshot(ts("2024-06-01 00:00:00")).get.schema
    // m longs + cell + pk — the dim-doubles vector must NOT be persisted
    cols.fields.map(_.name) should contain allOf
      ("vec_id", "cell", "code_0", "code_3")
    cols.fields.filter(_.dataType.typeName.startsWith("array")) shouldBe empty
  }

  it("PQ index keeps PK replacement and snapshot isolation") {
    val base = s"$tmpDir/annpq_pk"
    AnnIndex.buildIvfPq(spark, base, vectors(60), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts = ts("2024-01-01 00:00:00"))
    AnnIndex.appendVectorsPq(spark, base,
      vectors(120).where($"vec_id" >= 60), "vec_id", "embedding",
      ts("2024-01-02 00:00:00"))
    // day-1 snapshot never sees day-2 ids
    AnnIndex.queryIvfPq(spark, base, vectors(60).where($"vec_id" < 3),
        "vec_id", "embedding", k = 50, nProbe = 2, ts("2024-01-01 12:00:00"))
      .select($"neighbor_id").as[Long].collect()
      .forall(_ < 60) shouldBe true
    // re-ingest replaces, never duplicates
    AnnIndex.appendVectorsPq(spark, base,
      vectors(60, shift = 2.5).where($"vec_id" === 7), "vec_id", "embedding",
      ts("2024-01-03 00:00:00"))
    AnnIndex.queryIvfPq(spark, base, vectors(60).where($"vec_id" === 0),
        "vec_id", "embedding", k = 100, nProbe = 2, ts("2024-06-01 00:00:00"))
      .where($"neighbor_id" === 7).count() should be <= 1L
  }

  it("PQ retrieval holds recall parity with the raw-vector index (MRR gate)") {
    // the q117 contract on real embeddings: where does the TRUE nearest
    // neighbour land in each index's top-10? The codes-only index may not
    // lose meaningful retrieval quality vs storing raw vectors
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select($"vec_id".cast("long").as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    val queries = emb.where($"vec_id" < 20)
    val baseRaw = s"$tmpDir/annmrr_raw"
    val basePq = s"$tmpDir/annmrr_pq"
    AnnIndex.buildIvf(spark, baseRaw, emb, "vec_id", "embedding",
      nLists = 8, lloydIters = 2, ts("2024-01-01 00:00:00"))
    // production-shaped code budget: 8 subspaces × 64 codes (6 bits/sub-
    // space). The 4×8 default is the ORACLE-replayable toy size; recall
    // parity is a property of a real code budget
    AnnIndex.buildIvfPq(spark, basePq, emb, "vec_id", "embedding",
      nLists = 8, lloydIters = 2, m = 8, codesPerSubspace = 64, pqIters = 2,
      ts = ts("2024-01-01 00:00:00"))
    // exact ground truth by brute force (tiny corpus)
    val all = emb.as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val trueNn = all.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .maxBy { case (cid, cv) => (cos(qv, cv), -cid.toDouble) }._1
    }.toMap
    def mrr(hits: Map[Long, Seq[Long]]): Double =
      trueNn.map { case (qid, nn) =>
        hits.getOrElse(qid, Seq.empty).indexOf(nn) match {
          case -1 => 0.0
          case i => 1.0 / (i + 1)
        }
      }.sum / trueNn.size
    val rawHits = AnnIndex.queryIvf(spark, baseRaw, queries, "vec_id",
        "embedding", k = 10, nProbe = 2, ts("2024-06-01 00:00:00"))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq }
    // ADC-only hits: the shortlist must CONTAIN the true NN at raw-parity
    // rates (recall@10); within-shortlist ADC ranks are quantization-noisy
    val pqHits = AnnIndex.queryIvfPq(spark, basePq, queries, "vec_id",
        "embedding", k = 10, nProbe = 2, ts("2024-06-01 00:00:00"))
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq }
    // re-ranked hits: exact cosine over the shortlist's source-table fetch
    // must restore full MRR parity — the IVFADC + re-rank production split
    val rrHits = AnnIndex.queryIvfPqRerank(spark, basePq, queries, emb,
        "vec_id", "embedding", k = 10, nProbe = 2,
        ts("2024-06-01 00:00:00"), shortlist = 50)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq }
    def recallAt10(hits: Map[Long, Seq[Long]]): Double =
      trueNn.count { case (qid, nn) =>
        hits.getOrElse(qid, Seq.empty).contains(nn) }.toDouble / trueNn.size
    val (rawMrr, pqMrr, rrMrr) = (mrr(rawHits), mrr(pqHits), mrr(rrHits))
    val (rawR, pqR) = (recallAt10(rawHits), recallAt10(pqHits))
    withClue(s"rawMrr=$rawMrr pqMrr=$pqMrr rrMrr=$rrMrr rawR=$rawR pqR=$pqR: ") {
      pqR should be >= rawR * 0.8 // shortlist quality ~ raw index
      rrMrr should be >= rawMrr * 0.9 // re-rank restores the raw MRR
    }
  }

  it("compaction changes no query result, only the region count") {
    val base = s"$tmpDir/ann_compact"
    AnnIndex.buildIvf(spark, base, vectors(40), "vec_id", "embedding",
      nLists = 2, lloydIters = 1, ts("2024-01-01 00:00:00"))
    // three daily appends; day 3 re-ingests day 2's ids (superseded rows)
    AnnIndex.appendVectors(spark, base,
      vectors(80).where($"vec_id" >= 40), "vec_id", "embedding",
      ts("2024-01-02 00:00:00"))
    AnnIndex.appendVectors(spark, base,
      vectors(80, shift = 1.0).where($"vec_id" >= 40), "vec_id", "embedding",
      ts("2024-01-03 00:00:00"))
    def query() = AnnIndex.queryIvf(spark, base, vectors(40).where($"vec_id" < 5),
        "vec_id", "embedding", k = 10, nProbe = 2, ts("2024-06-01 00:00:00"))
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val pre = query()
    val table = graft.storage.Storage.openTable(spark, base, AnnIndex.CodesTable).get
    val preRegions = table.regions.length
    table.compact(ts("2024-02-01 00:00:00"))
    val post = query()
    post shouldBe pre
    val postRegions = graft.storage.Storage
      .openTable(spark, base, AnnIndex.CodesTable).get.regions.length
    postRegions should be < preRegions
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
