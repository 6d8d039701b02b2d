package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class IvfPqSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  describe("ivfPqTopK") {

    it("finds most of the true nearest neighbours (recall vs exact L2)") {
      // ADC approximates squared-L2, so the honest ground truth is exact L2
      // top-k (bruteForceTopK ranks by cosine — a different metric on
      // unnormalised vectors). 500x64 floats: exact truth computed locally.
      val all = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
      def l2(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val truth = all.take(10).map { case (qid, qv) =>
        qid -> all.filter(_._1 != qid)
          .map { case (nid, nv) => (l2(qv, nv), nid) }
          .sortBy(t => (t._1, t._2)).take(5).map(_._2).toSet
      }.toMap
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val ap = df.select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        ap.keySet shouldBe truth.keySet
        truth.keys.toSeq
          .map(q => (ap(q) intersect truth(q)).size.toDouble / truth(q).size)
          .sum / truth.size
      }

      // the synthetic embeddings are near-random (no cluster structure), the
      // hardest regime for PQ — absolute recall is bounded by quantization
      // error, not by the index. The assertions pin the properties that
      // matter and are deterministic (seeded k-means, fixed tie-breaks):
      // (1) cell probing loses little: measured separately, exact-distance
      //     IVF at 4/8 probes holds 0.92 recall on this data — so assert a
      //     floor on the composite at 4/8 probes;
      val partial = recall(Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nLists = 8, coarseIters = 2, nProbe = 4,
        m = 8, codesPerSubspace = 16, pqIters = 2))
      partial should be >= 0.2 // measured 0.26

      // (2) residual encoding beats plain PQ at identical m/k (the reason
      //     IVF-PQ quantizes residuals at all);
      val fullProbe = recall(Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nLists = 8, coarseIters = 2, nProbe = 8,
        m = 8, codesPerSubspace = 16, pqIters = 2))
      val model = Quantization.train(emb, "vec_id", "embedding", dim = 64,
        m = 8, k = 16, lloydIters = 2)
      val plainAdc = recall(Quantization.adcTopK(
        Quantization.encode(emb, "vec_id", "embedding", model),
        queries, "vec_id", "embedding", model, k = 5))
      fullProbe should be > plainAdc // measured 0.30 vs 0.20

      // (3) recall rises with codebook capacity (m16k32 measured 0.48)
      val bigger = recall(Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nLists = 8, coarseIters = 2, nProbe = 8,
        m = 16, codesPerSubspace = 32, pqIters = 3))
      bigger should be > fullProbe
      bigger should be >= 0.45
    }

    it("is deterministic across runs") {
      def run() = Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 3, nLists = 8, nProbe = 2)
        .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
      run() shouldBe run()
    }

    it("returns at most k rows per query with contiguous ranks") {
      val out = Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 4, nLists = 8, nProbe = 2)
        .as[(Long, Long, Double, Long)].collect().groupBy(_._1)
      out.values.foreach { rows =>
        rows.length should be <= 4
        rows.map(_._4).sorted shouldBe (1L to rows.length.toLong).toArray
      }
    }

    it("never pairs a query with itself") {
      Quantization.ivfPqTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nLists = 8, nProbe = 8)
        .where(col("query_id") === col("neighbor_id")).count() shouldBe 0L
    }
  }
}
