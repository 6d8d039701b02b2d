package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Round-7 operators: per-group OLS trend, PCA top component, entity
  * resolution, temperature sampling, containment pairs. */
class Round7OpsSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("Trend.groupTrend") {
    it("recovers an exact linear relationship with r2 = 1") {
      val df = (1 to 50).map(i => ("a", i.toDouble, 3.0 * i + 7.0)).toDF("g", "x", "y")
      val r = Trend.groupTrend(df, Seq(col("g")), col("x"), col("y")).collect().head
      r.getAs[Long]("n") shouldBe 50L
      r.getAs[Double]("slope") shouldBe 3.0 +- 1e-9
      r.getAs[Double]("intercept") shouldBe 7.0 +- 1e-9
      r.getAs[Double]("r2") shouldBe 1.0 +- 1e-9
    }

    it("fits each group independently and nulls degenerate groups") {
      val df = Seq(
        ("up", 1.0, 1.0), ("up", 2.0, 3.0), ("up", 3.0, 5.0),
        ("down", 1.0, 9.0), ("down", 2.0, 7.0), ("down", 3.0, 5.0),
        ("flatx", 2.0, 1.0), ("flatx", 2.0, 5.0)) // constant x: no fit
        .toDF("g", "x", "y")
      val m = Trend.groupTrend(df, Seq(col("g")), col("x"), col("y"))
        .collect().map(r => r.getString(0) -> r).toMap
      m("up").getAs[Double]("slope") shouldBe 2.0 +- 1e-9
      m("down").getAs[Double]("slope") shouldBe -2.0 +- 1e-9
      assert(m("flatx").isNullAt(m("flatx").fieldIndex("slope")))
      assert(m("flatx").isNullAt(m("flatx").fieldIndex("r2")))
    }

    it("constant y over varying x gives slope 0 and null r2") {
      val df = Seq(("g", 1.0, 4.0), ("g", 2.0, 4.0), ("g", 3.0, 4.0)).toDF("g", "x", "y")
      val r = Trend.groupTrend(df, Seq(col("g")), col("x"), col("y")).collect().head
      r.getAs[Double]("slope") shouldBe 0.0
      assert(r.isNullAt(r.fieldIndex("r2")))
    }
  }

  describe("Pca.principalComponent") {
    it("finds the dominant axis of an anisotropic cloud") {
      // points along (1,1)/sqrt(2) with small orthogonal jitter
      val pts = (0 until 200).map { i =>
        val t = (i - 100) / 10.0
        val o = ((i * 37) % 11 - 5) / 50.0
        Tuple1(Array((t + o).toFloat, (t - o).toFloat))
      }
      val df = pts.toDF("embedding")
      val out = Pca.principalComponent(df, "embedding", iterations = 6)
        .orderBy("pos").collect()
      out.length shouldBe 2
      val l0 = out(0).getAs[Double]("loading")
      val l1 = out(1).getAs[Double]("loading")
      // dominant direction ~ (1,1)/sqrt(2); sign convention makes it positive
      l0 shouldBe 0.7071 +- 0.01
      l1 shouldBe 0.7071 +- 0.01
      out(0).getAs[Double]("var_share") should be > 0.95
    }

    it("is invariant to partitioning (exact integer sums)") {
      val pts = (0 until 120).map { i =>
        Tuple1(Array.tabulate(5)(d => ((i * (d + 3)) % 17 - 8).toFloat / 4f))
      }
      val a = Pca.principalComponent(pts.toDF("embedding").repartition(1), "embedding")
        .orderBy("pos").collect().map(_.getAs[Double]("loading"))
      val b = Pca.principalComponent(pts.toDF("embedding").repartition(7), "embedding")
        .orderBy("pos").collect().map(_.getAs[Double]("loading"))
      a.toSeq shouldBe b.toSeq
    }

    it("rejects ragged vectors") {
      val df = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f, 2f, 3f))).toDF("embedding")
      // thrown inside the moment aggregate's task -> surfaces wrapped
      val ex = intercept[Exception] { Pca.principalComponent(df, "embedding") }
      ex.getMessage should include("ragged")
    }
  }

  describe("Fuzzy.resolveEntities") {
    it("maps every spelling of an entity to one canonical record") {
      val df = Seq(
        (1L, "acme corp"), (2L, "acme corp"), (3L, "acme  corp"), // dist 0 after tokenizing; "acme corpx" dist 1
        (4L, "acme corpx"), (5L, "zenith ltd"), (6L, "zenith ltd"),
        (7L, "standalone co")).toDF("id", "name")
      val out = Fuzzy.resolveEntities(df, "id", "name", maxDist = 2)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("entity_id"), r.getAs[String]("canonical_name"), r.getAs[Long]("n_members"))).toMap
      // acme cluster: ids 1-4 (corp ~ corpx at dist 1, share token "acme")
      out(1L) shouldBe ((1L, "acme  corp", 4L)) // lexicographic min name (double space < single)
      out(4L)._1 shouldBe 1L
      out(4L)._3 shouldBe 4L
      // zenith cluster: 5,6
      out(5L) shouldBe ((5L, "zenith ltd", 2L))
      // singleton keeps itself
      out(7L) shouldBe ((7L, "standalone co", 1L))
    }

    it("keeps rows of distinct non-matching names as their own entities") {
      val df = Seq((10L, "alpha x"), (11L, "omega y")).toDF("id", "name")
      val out = Fuzzy.resolveEntities(df, "id", "name", maxDist = 1)
      out.where(col("n_members") === 1).count() shouldBe 2
    }
  }

  describe("Sampling.temperatureSample") {
    it("keeps all of the smallest source and sqrt-downsamples larger ones") {
      val rows = (1 to 900).map(i => (i.toLong, "big")) ++
        (901 to 1000).map(i => (i.toLong, "small"))
      val df = rows.toDF("id", "src")
      val out = Sampling.temperatureSample(df, "src", col("id"))
      val counts = out.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts("small") shouldBe 100L // rate 1.0
      // big keeps ~sqrt(100/900) = 1/3 of 900 = ~300 (hash noise tolerated)
      counts("big").toDouble shouldBe 300.0 +- 45.0
    }

    it("is deterministic under repartitioning") {
      val df = (1 to 500).map(i => (i.toLong, if (i % 5 == 0) "a" else "b")).toDF("id", "src")
      val a = Sampling.temperatureSample(df.repartition(1), "src", col("id"))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val b = Sampling.temperatureSample(df.repartition(8), "src", col("id"))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      a shouldBe b
    }
  }

  describe("Dedup.containmentPairs") {
    it("finds a doc wrapped in boilerplate, directionally") {
      val payload = "the quick brown fox jumps over the lazy dog again and again"
      val wrapped = "HEADER NAV MENU " + payload + " FOOTER COPYRIGHT LINKS"
      val other = "completely different content with no overlap whatsoever here"
      val df = Seq((1L, payload), (2L, wrapped), (3L, other)).toDF("doc_id", "text")
      val out = Dedup.containmentPairs(df, "doc_id", "text",
        n = 5, threshold = 0.8, maxGramFreq = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // payload is contained in wrapped, not vice versa
      out.map(p => (p._1, p._2)) should contain((1L, 2L))
      out.map(p => (p._1, p._2)) should not contain ((2L, 1L))
      out.find(p => p._1 == 1L && p._2 == 2L).get._3 should be >= 0.8
      out.map(p => (p._1, p._2)) should not contain ((3L, 2L))
    }

    it("never pairs a doc with itself and respects the hot-gram cap") {
      val common = "shared boilerplate text that every single document carries along"
      val df = (1L to 12L).map(i => (i, common)).toDF("doc_id", "text")
      // every gram occurs in all 12 docs > cap 10 -> no candidates at all
      Dedup.containmentPairs(df, "doc_id", "text",
        n = 5, threshold = 0.8, maxGramFreq = 10).count() shouldBe 0L
      // with the cap lifted, identical docs contain each other both ways
      val pairs = Dedup.containmentPairs(df, "doc_id", "text",
        n = 5, threshold = 0.8, maxGramFreq = 1000)
      pairs.where(col("id_contained") === col("id_container")).count() shouldBe 0L
      pairs.count() shouldBe 12L * 11L
    }
  }
}
