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
