package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class QuantizationSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val dim = 8
  // 40 vectors in 4 well-separated blobs around distinct corners
  private lazy val corpus = {
    val rows = (0 until 40).map { i =>
      val blob = i % 4
      val base = Array.tabulate(dim)(d => if ((blob >> (d % 2)) % 2 == 0) 5.0 else -5.0)
      (i.toLong, base.zipWithIndex.map { case (b, d) => b + 0.01 * ((i * 7 + d) % 13) })
    }
    rows.toDF("vec_id", "embedding")
  }

  describe("product quantization") {
    it("emits codes inside [0, k) for every subspace") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 2, k = 4)
      val coded = Quantization.encode(corpus, "vec_id", "embedding", model)
      coded.count() shouldBe 40
      (0 until 2).foreach { j =>
        val mm = coded.agg(min(col(s"code_$j")), max(col(s"code_$j")))
          .as[(Long, Long)].first()
        mm._1 should be >= 0L
        mm._2 should be < 4L
      }
    }

    it("is deterministic under repartitioning") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 2, k = 4)
      val a = Quantization.encode(corpus, "vec_id", "embedding", model)
        .orderBy("vec_id").collect().toSeq
      val model2 = Quantization.train(corpus.repartition(7), "vec_id", "embedding", dim, m = 2, k = 4)
      val b = Quantization.encode(corpus.repartition(3), "vec_id", "embedding", model2)
        .orderBy("vec_id").collect().toSeq
      b shouldBe a
    }

    it("assigns identical vectors identical codes") {
      val dup = corpus.union(corpus.filter(col("vec_id") === 0)
        .select(lit(999L).as("vec_id"), col("embedding")))
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 2, k = 4)
      val coded = Quantization.encode(dup, "vec_id", "embedding", model)
      val c0 = coded.filter(col("vec_id") === 0).drop("vec_id").first()
      val c999 = coded.filter(col("vec_id") === 999).drop("vec_id").first()
      c999 shouldBe c0
    }

    it("encode rejects dim drift and reserved passthrough names") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 4, k = 4)
      val wrongDim = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
      val ex = intercept[Exception] {
        Quantization.encode(wrongDim, "vec_id", "embedding", model).collect()
      }
      ex.getMessage should include("does not match expected dim")
      an[IllegalArgumentException] should be thrownBy
        Quantization.encode(corpus, "vec_id", "embedding", model,
          passthrough = Seq("code_0"))
    }

    it("a saved model reloads bit-identically and encodes the same codes") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 4, k = 4)
      val path = s"$tmpDir/pq_model"
      model.save(spark, path)
      val loaded = Quantization.loadModel(spark, path)
      loaded.subDim shouldBe model.subDim
      loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq shouldBe
        model.codebooks.map(_.map(_.toSeq).toSeq).toSeq
      val a = Quantization.encode(corpus, "vec_id", "embedding", model)
        .orderBy("vec_id").collect().map(_.toString)
      val b = Quantization.encode(corpus, "vec_id", "embedding", loaded)
        .orderBy("vec_id").collect().map(_.toString)
      b shouldBe a
    }

    it("ADC search surfaces the query's own blob (codes preserve cluster geometry)") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 2, k = 4)
      val coded = Quantization.encode(corpus, "vec_id", "embedding", model)
      val queries = corpus.filter(col("vec_id") < 4)
      val top = Quantization.adcTopK(coded, queries, "vec_id", "embedding", model, k = 5)
        .as[(Long, Long, Double, Long)].collect()
      top.groupBy(_._1).foreach { case (qid, rows) =>
        // every returned neighbour of query q sits in q's blob (id mod 4)
        rows.foreach { case (_, nid, _, _) => nid % 4 shouldBe qid % 4 }
      }
    }

    it("adcTopK's dim-drift guard is lazy: plan builds clean, execution fails loud") {
      val model = Quantization.train(corpus, "vec_id", "embedding", dim, m = 2, k = 4)
      val coded = Quantization.encode(corpus, "vec_id", "embedding", model)
      val shortQ = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
      // construction must NOT run a Spark job (the old eager guard scanned
      // the queries frame per call, even in explain-only contexts)
      val planned = Quantization.adcTopK(coded, shortQ, "vec_id", "embedding", model, k = 3)
      planned.queryExecution.analyzed // resolves without executing
      val ex = intercept[Exception] { planned.collect() }
      ex.getMessage should include("does not match the PQ model")
    }
  }
}
