package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.operators.Similarity

class RecallProbeSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 10)

  describe("recallAtK") {
    it("is the recovered fraction of truth pairs") {
      val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
        .toDF("query_id", "neighbor_id")
      val approx = Seq((1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L))
        .toDF("query_id", "neighbor_id")
      RecallProbe.recallAtK(approx, truth) shouldBe 0.75
    }
  }

  describe("exactL2TopK") {
    it("matches a local brute-force computation") {
      val all = emb.as[(Long, Array[Double])].collect()
      def l2(a: Array[Double], b: Array[Double]): Double = {
        // same fold shape as the distributed aggregate: sequential sum
        var d = 0.0; var i = 0
        while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
        d
      }
      val want = all.filter(_._1 < 10).map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid)
          .map { case (nid, nv) =>
            (BigDecimal(l2(qv, nv)).setScale(6, BigDecimal.RoundingMode.HALF_UP), nid)
          }
          .sortBy(identity).take(5).map(_._2).toSeq
      }.toMap
      val got = RecallProbe.exactL2TopK(emb, queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
        .collect().groupBy(_._1).view
        .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      got shouldBe want
    }
  }

  describe("index recall invariants (full-coverage configs are exact)") {
    it("IVF at nProbe == nLists recovers the cosine truth exactly") {
      val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nLists = 4, lloydIters = 1, nProbe = 4)
      RecallProbe.recallAtK(full, truth) shouldBe 1.0
    }

    it("SRP at probeRadius == nPlanes recovers the cosine truth exactly") {
      val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      val full = Similarity.srpAnnTopK(emb, queries, "vec_id", "embedding", 5,
        nPlanes = 4, dim = 64, probeRadius = 4)
      RecallProbe.recallAtK(full, truth) shouldBe 1.0
    }
  }

  describe("recall floors (quantization/index changes cannot silently degrade retrieval)") {
    // Pinned from the round-10 RecallProbe run at sf0.001 (100 queries,
    // k=10): srp(8,2)=0.318, ivf(16,4)=0.629, pq-adc(8,16)=0.273,
    // ivf-pq(16,4,8,16)=0.299, rerank(16,4,8,16)=0.586. Every family is
    // deterministic (seeded k-means, strict-< argmin, id tie-breaks), so a
    // floor breach means a code change ACTUALLY lost retrieval quality —
    // floors sit ~15% under measured to absorb benign numeric drift only.
    lazy val q100 = emb.filter(col("vec_id") < 100)
    lazy val truthCos = Similarity.bruteForceTopK(emb, q100, "vec_id", "embedding", 10)
    lazy val truthL2 = RecallProbe.exactL2TopK(emb, q100, "vec_id", "embedding", 10)

    it("SRP nPlanes=8 radius=2 holds its floor") {
      RecallProbe.recallAtK(Similarity.srpAnnTopK(emb, q100, "vec_id", "embedding",
        10, nPlanes = 8, dim = 64, probeRadius = 2), truthCos) should be >= 0.27
    }

    it("IVF nLists=16 nProbe=4 holds its floor") {
      RecallProbe.recallAtK(Similarity.ivfTopK(emb, q100, "vec_id", "embedding",
        10, nLists = 16, lloydIters = 2, nProbe = 4), truthCos) should be >= 0.53
    }

    it("PQ-ADC m=8 k=16 holds its floor") {
      import graft.operators.Quantization
      val model = Quantization.train(emb, "vec_id", "embedding", 64, m = 8,
        k = 16, lloydIters = 2)
      RecallProbe.recallAtK(Quantization.adcTopK(
        Quantization.encode(emb, "vec_id", "embedding", model),
        q100, "vec_id", "embedding", model, 10), truthL2) should be >= 0.23
    }

    it("persisted IVF-PQ + rerank holds its floor AND beats the raw shortlist") {
      import graft.operators.{AnnIndex, Quantization}
      val buildTs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val asOf = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val base = java.nio.file.Files.createTempDirectory("graft-floor-idx").toString
      AnnIndex.buildIvfPq(spark, base, emb, "vec_id", "embedding",
        nLists = 16, lloydIters = 2, m = 8, codesPerSubspace = 16,
        pqIters = 2, ts = buildTs)
      val shortlistR = RecallProbe.recallAtK(
        Quantization.ivfPqTopK(emb, q100, "vec_id", "embedding", 64, 10,
          nLists = 16, coarseIters = 2, nProbe = 4, m = 8,
          codesPerSubspace = 16, pqIters = 2), truthL2)
      val rerankR = RecallProbe.recallAtK(
        AnnIndex.queryIvfPqRerank(spark, base, q100, emb, "vec_id", "embedding",
          10, nProbe = 4, asOf), truthCos)
      shortlistR should be >= 0.25
      rerankR should be >= 0.50
      // the re-rank exists to fix ADC's within-shortlist ordering noise —
      // it must add REAL recall over the raw codes at the same probe cost
      (rerankR - shortlistR) should be >= 0.15
    }

    it("rerank with full probes and a corpus-wide shortlist is EXACT") {
      import graft.operators.AnnIndex
      val buildTs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val asOf = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val q10 = emb.filter(col("vec_id") < 10)
      val truth10 = Similarity.bruteForceTopK(emb, q10, "vec_id", "embedding", 5)
      val base = java.nio.file.Files.createTempDirectory("graft-exact-idx").toString
      AnnIndex.buildIvfPq(spark, base, emb, "vec_id", "embedding",
        nLists = 4, lloydIters = 1, m = 4, codesPerSubspace = 8,
        pqIters = 1, ts = buildTs)
      val full = AnnIndex.queryIvfPqRerank(spark, base, q10, emb, "vec_id",
        "embedding", 5, nProbe = 4, asOf, shortlist = 1000)
      RecallProbe.recallAtK(full, truth10) shouldBe 1.0
    }
  }

  describe("celled margin mining pair-recall floor") {
    it("partial probes hold their floor; full probes recover every exact pair") {
      // sweepMarginMining mines X (the sf corpus) against a jittered
      // id-offset twin Y — the bitext shape. Floors pinned from the round-11
      // measurement at this exact (corpus, jitter, k) so a quantizer or
      // probe change cannot silently drop mined pairs; nProbe == nCells is
      // the operator's own bit-equality contract (1.0 by construction,
      // TemporalSpec pins the stronger full-row equality).
      val rows = RecallProbe.sweepMarginMining(emb, tag = "spec", k = 4)
      info(rows.map(r => f"${r.params} recall=${r.recall}%.3f scan=${r.scanFrac}%.3f").mkString("; "))
      val byProbe = rows.map(r => r.params -> r.recall).toMap
      // measured r11: nProbe=2 → 0.996, nProbe>=4 → 1.000 (the jittered
      // twin sits close, so a well-placed quantizer catches nearly all of
      // it — the floors leave only benign-drift slack)
      byProbe("nCells=32 nProbe=32 k=4") shouldBe 1.0
      byProbe("nCells=32 nProbe=16 k=4") should be >= 0.99
      byProbe("nCells=32 nProbe=4 k=4") should be >= 0.97
      byProbe("nCells=32 nProbe=2 k=4") should be >= 0.93
      // recall is monotone in probes (same centroids, nested candidates
      // except for neighbourhood-sum drift at tiny probes)
      byProbe("nCells=32 nProbe=16 k=4") should be >=
        byProbe("nCells=32 nProbe=2 k=4")
    }
  }

  describe("replicate") {
    it("grows the corpus repl-fold with distinct ids and no exact duplicates") {
      val rep = RecallProbe.replicate(emb.limit(50), repl = 3)
      rep.count() shouldBe 150
      rep.select("vec_id").distinct().count() shouldBe 150
      // jitter keeps replicas off the originals: no two rows share a vector
      rep.groupBy(col("embedding")).count().where(col("count") > 1).count() shouldBe 0
    }
  }
}
