package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

import graft.SparkTestBase
import graft.dataquality.MetricsRepository

class SkewAndMetricsSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("salted join") {
    it("matches the plain join result") {
      val left = Seq.tabulate(1000)(i => (if (i < 900) 1L else i.toLong, s"v$i"))
        .toDF("k", "payload") // key 1 is hot
      val right = Seq((1L, "dim1"), (5L, "dim5"), (950L, "dim950")).toDF("k", "name")
      val plain = left.join(right, Seq("k")).count()
      val salted = Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      salted.count() shouldBe plain
      salted.columns.toSet shouldBe Set("k", "payload", "name")
    }

    it("spreads a hot key over multiple salt buckets, deterministically") {
      // hot key with VARYING payload (the real-world hot-key shape): the
      // content salt spreads it; identical rows sharing a bucket is the
      // documented trade for stage-retry determinism
      val left = Seq.tabulate(500)(i => (1L, s"payload_$i")).toDF("k", "payload")
      val salted = left.withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8L)).cast("int"))
      salted.select("_salt").distinct().count() should be > 4L
      // salt depends only on content — identical under repartitioning
      // (what a stage retry amounts to), unlike a positional id
      val a = salted.select("payload", "_salt").as[(String, Int)].collect().sorted
      val b = left.repartition(13).withColumn("_salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8L)).cast("int"))
        .select("payload", "_salt").as[(String, Int)].collect().sorted
      b shouldBe a
    }

    it("salted as-of join equals the unsalted native join, hot key included") {
      // one hot key carrying most rows plus normal keys; equality must
      // hold for backward, forward, and tolerance variants
      val trades = Seq.tabulate(300)(i =>
        (if (i < 250) 1L else (i % 7).toLong, i.toLong * 3 + 1, s"t$i"))
        .toDF("sym", "t", "tag")
      val quotes = Seq.tabulate(120)(i =>
        ((i % 9).toLong, i.toLong * 7, i * 0.5)).toDF("r_sym", "r_t", "px")
      for ((dir, tol) <- Seq(("backward", None), ("forward", None),
          ("backward", Some(40L)))) withClue(s"dir=$dir tol=$tol: ") {
        val plain = graft.plans.AsOf.asOfJoin(trades, quotes,
          Seq("sym"), Seq("r_sym"), "t", "r_t", dir, tol)
        val salted = Skew.saltedAsOfJoin(trades, quotes,
          Seq("sym"), Seq("r_sym"), "t", "r_t", dir, tol, saltBuckets = 8)
        salted.count() shouldBe 300L // left-outer multiplicity preserved
        salted.exceptAll(plain).count() shouldBe 0
        plain.exceptAll(salted).count() shouldBe 0
      }
      // the exchange clusters on (key, salt): the hot key is spread
      val plan = Skew.saltedAsOfJoin(trades, quotes,
        Seq("sym"), Seq("r_sym"), "t", "r_t", saltBuckets = 8)
        .queryExecution.executedPlan.toString
      plan should include("AsOfJoin")
      plan should include("_gsalt")
    }

    it("salted interval join equals the unsalted native join pair multiset") {
      val points = Seq.tabulate(300)(i =>
        (if (i < 250) 1L else (i % 5).toLong, i.toLong * 2, s"p$i"))
        .toDF("k", "t", "tag")
      val intervals = Seq.tabulate(60)(i =>
        ((i % 6).toLong, i.toLong * 9, i.toLong * 9 + 25, s"iv$i"))
        .toDF("i_k", "i_s", "i_e", "i_tag")
      val plain = graft.plans.IntervalJoin.intervalJoin(points, intervals,
        Seq("k"), Seq("i_k"), "t", "i_s", "i_e")
      val salted = Skew.saltedIntervalJoin(points, intervals,
        Seq("k"), Seq("i_k"), "t", "i_s", "i_e", saltBuckets = 8)
      salted.exceptAll(plain).count() shouldBe 0
      plain.exceptAll(salted).count() shouldBe 0
    }

    it("salted count/sum equals the direct aggregation") {
      val df = Seq.tabulate(500)(i => (i % 3, i.toDouble)).toDF("k", "v")
      val direct = df.groupBy("k").agg(count(lit(1)), sum("v"))
        .as[(Int, Long, Double)].collect().sortBy(_._1)
      val salted = Skew.saltedCountSum(df, Seq("k"), Seq("v"), 8)
        .as[(Int, Long, Double)].collect().sortBy(_._1)
      salted shouldBe direct
    }
  }

  describe("deterministic sampling") {
    it("is stable under repartitioning and close to the requested rate") {
      val docs = spark.range(10000).select(col("id"), (col("id") % 7).as("junk"))
      val s1 = Sampling.hashSample(docs, col("id"), 0.3)
        .select("id").as[Long].collect().sorted
      val s2 = Sampling.hashSample(docs.repartition(17), col("id"), 0.3)
        .select("id").as[Long].collect().sorted
      s2 shouldBe s1 // membership depends only on content, not partitioning
      s1.length.toDouble / 10000 shouldBe 0.3 +- 0.02
    }

    it("gives null keys a deterministic bucket instead of dropping them") {
      // md5(null) is null — without the sentinel coalesce every null-key row
      // would fall out of the sample regardless of rate
      val df = spark.range(1000)
        .select(when(col("id") % 2 === 0, col("id").cast("string")).as("k"))
      Sampling.hashSample(df, col("k"), 1.0).count() shouldBe 1000
      val half = Sampling.hashSample(df, col("k"), 0.5)
      // nulls are all-in or all-out at a given rate (one shared bucket), and
      // membership stays stable across partitionings
      val nullsKept = half.where(col("k").isNull).count()
      Seq(0L, 500L) should contain(nullsKept)
      Sampling.hashSample(df.repartition(13), col("k"), 0.5)
        .where(col("k").isNull).count() shouldBe nullsKept
    }

    it("caps rows per key deterministically") {
      val df = spark.range(1000)
        .select((col("id") % 10).as("k"), col("id").as("v"))
      val capped = Sampling.cappedPerKey(df, Seq(col("k")), col("v"), maxPerKey = 7)
      // every key capped at exactly 7 (each has 100 rows)
      capped.groupBy("k").count().select("count").as[Long].collect()
        .foreach(_ shouldBe 7L)
      // the surviving set is content-determined, not partitioning-determined
      val a = capped.select("v").as[Long].collect().sorted
      val b = Sampling.cappedPerKey(df.repartition(13), Seq(col("k")), col("v"), 7)
        .select("v").as[Long].collect().sorted
      b shouldBe a
      // keys with fewer rows than the cap keep everything
      val tiny = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("k", "v")
      Sampling.cappedPerKey(tiny, Seq(col("k")), col("v"), 7).count() shouldBe 3L
      // duplicate rank keys: a tieBreak column restores total order, so the
      // surviving rows are still partitioning-independent
      val dup = spark.range(100).select(lit(1L).as("k"), lit("same").as("r"),
        col("id").as("payload"))
      val d1 = Sampling.cappedPerKey(dup, Seq(col("k")), col("r"), 5,
        tieBreak = Seq(col("payload")))
        .select("payload").as[Long].collect().sorted
      val d2 = Sampling.cappedPerKey(dup.repartition(7), Seq(col("k")), col("r"), 5,
        tieBreak = Seq(col("payload")))
        .select("payload").as[Long].collect().sorted
      d2 shouldBe d1
      d1.length shouldBe 5
    }

    it("weighted sampling keeps rows in proportion to their own weight, monotonically") {
      val df = spark.range(20000).select(col("id"),
        when(col("id") % 2 === 0, 0.9).otherwise(0.1).as("w"))
      val kept = Sampling.weightedHashSample(df, col("id"), col("w"))
        .groupBy((col("id") % 2).as("par")).count().as[(Long, Long)].collect().toMap
      kept(0L).toDouble / 10000 shouldBe 0.9 +- 0.02
      kept(1L).toDouble / 10000 shouldBe 0.1 +- 0.02
      // monotone: raising every weight only ADDS rows (same hash, higher bar)
      val low = Sampling.weightedHashSample(df, col("id"), col("w"))
        .select("id").as[Long].collect().toSet
      val high = Sampling.weightedHashSample(df, col("id"), col("w") + 0.05)
        .select("id").as[Long].collect().toSet
      low.subsetOf(high) shouldBe true
      // weights clamp: >1 keeps everything, <0 keeps nothing
      Sampling.weightedHashSample(df, col("id"), lit(5.0)).count() shouldBe 20000L
      Sampling.weightedHashSample(df, col("id"), lit(-1.0)).count() shouldBe 0L
    }

    it("epoch shuffle keys reorder between epochs, reproducibly within one") {
      val df = spark.range(2000).toDF("id")
      def order(epoch: Long) = df
        .orderBy(Sampling.epochShuffleKey(col("id"), epoch))
        .select("id").as[Long].collect().toSeq
      order(1) shouldBe order(1) // reproducible
      order(1) should not be order(2) // epochs differ
      order(1).sorted shouldBe order(2).sorted // same corpus, permuted
    }

    it("samples exactly k rows, content-determined") {
      val df = spark.range(5000).toDF("id")
      val a = Sampling.sampleExactK(df, col("id"), 50)
        .select("id").as[Long].collect().sorted
      a.length shouldBe 50
      // same members whatever the partitioning; limit(k) would differ
      val b = Sampling.sampleExactK(df.repartition(13), col("id"), 50)
        .select("id").as[Long].collect().sorted
      b shouldBe a
      // growth property: adding rows can only swap members in, never
      // reorder the hash ranking of existing ones — the k-sample of a
      // superset is drawn from the same ranking prefix
      val bigger = Sampling.sampleExactK(spark.range(10000).toDF("id"), col("id"), 50)
        .select("id").as[Long].collect().toSet
      (a.toSet intersect bigger).size should be >= 25 // ~half survive a 2x corpus
    }

    it("splits into named fractions, stable under corpus growth") {
      val df = spark.range(20000).toDF("id")
      val out = Sampling.splitByHash(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
      counts.keySet shouldBe Set("train", "val", "test")
      counts("train").toDouble / 20000 shouldBe 0.8 +- 0.02
      counts("val").toDouble / 20000 shouldBe 0.1 +- 0.01
      counts("test").toDouble / 20000 shouldBe 0.1 +- 0.01
      // growth stability: the assignment of the first 10k ids is unchanged
      // when the other 10k arrive — the leak-free eval-set property
      val small = Sampling.splitByHash(spark.range(10000).toDF("id"), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .as[(Long, String)].collect().sortBy(_._1)
      val big = out.where(col("id") < 10000).as[(Long, String)].collect().sortBy(_._1)
      big shouldBe small
      // fractions must be sane; split column must not collide
      an[IllegalArgumentException] should be thrownBy
        Sampling.splitByHash(df, col("id"), Seq("a" -> 0.9, "b" -> 0.2))
      an[IllegalArgumentException] should be thrownBy
        Sampling.splitByHash(out, col("id"), Seq("a" -> 1.0))
    }

    it("applies per-stratum rates with a default") {
      val df = spark.range(4000)
        .select(col("id"), when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
      val out = Sampling.stratifiedHashSample(df, col("id"), col("lang"),
        rates = Map("en" -> 0.1), defaultRate = 0.8)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      out("en").toDouble / 2000 shouldBe 0.1 +- 0.04
      out("de").toDouble / 2000 shouldBe 0.8 +- 0.04
    }
  }

  describe("distribution drift") {
    it("identical distributions give ~zero divergence; shifts are positive") {
      val a = spark.range(1000).select((col("id") % 4).cast("string").as("c"))
      val same = Drift.driftSummary(a, a, col("c"))
        .as[(Double, Double, Double, Double)].head()
      same shouldBe ((0.0, 0.0, 0.0, 0.0))
      // skew one category hard
      val b = spark.range(1000).select((col("id") % 2).cast("string").as("c"))
      val (klAb, klBa, js, psi) = Drift.driftSummary(a, b, col("c"))
        .as[(Double, Double, Double, Double)].head()
      klAb should be > 0.0
      klBa should be > 0.0
      js should be > 0.0
      js should be <= math.log(2) + 1e-9 // JS bounded by ln 2
      psi should be > 0.0
    }

    it("categories seen on one side only stay finite via smoothing") {
      val a = Seq("x", "x", "y").toDF("c")
      val b = Seq("x", "z").toDF("c")
      val rows = Drift.categoryDrift(a, b, col("c"))
        .select("category", "n_a", "n_b", "kl_ab_term")
        .as[(String, Long, Long, Double)].collect().sortBy(_._1)
      rows.map(_._1) shouldBe Array("x", "y", "z")
      rows.foreach { case (_, _, _, kl) => kl.isNaN shouldBe false }
      // y missing on b: n_b = 0, contribution finite and positive
      val y = rows.find(_._1 == "y").get
      y._3 shouldBe 0L
      y._4 should be > 0.0
    }
  }

  describe("mutual information") {
    it("is ~zero for independent variables and ln(k) for identical ones") {
      // x uniform over 4, y = x: I = H(x) = ln 4; nmi = 1
      val same = spark.range(4000).select((col("id") % 4).as("x"))
        .select(col("x"), col("x").as("y"))
      val (n1, mi1, nmi1) = Drift.mutualInformation(same, col("x"), col("y"))
        .as[(Long, Double, Option[Double])].head()
      n1 shouldBe 4000L
      mi1 shouldBe math.log(4) +- 1e-4
      nmi1.get shouldBe 1.0 +- 1e-4
      // independent: x = id%4, y = (id/4)%5 — every cell equally likely
      val indep = spark.range(4000).select((col("id") % 4).as("x"),
        ((col("id") / 4).cast("long") % 5).as("y")) // integer div: / on longs is double
      val (_, mi2, _) = Drift.mutualInformation(indep, col("x"), col("y"))
        .as[(Long, Double, Option[Double])].head()
      mi2 shouldBe 0.0 +- 1e-6
      // constant variable: undefined nmi, zero mi
      val const = spark.range(100).select(lit("c").as("x"), (col("id") % 3).as("y"))
      val (_, mi3, nmi3) = Drift.mutualInformation(const, col("x"), col("y"))
        .as[(Long, Double, Option[Double])].head()
      mi3 shouldBe 0.0
      nmi3 shouldBe None
    }
  }

  describe("metrics repository") {
    it("stores runs and flags anomalous metric movement") {
      val repo = new MetricsRepository(spark, s"$tmpDir/metrics")
      repo.save(Timestamp.valueOf("2024-01-01 00:00:00"),
        Map(("docs", "row_count") -> 1000.0, ("docs", "null_ratio") -> 0.01))
      val current = Map(("docs", "row_count") -> 1010.0, ("docs", "null_ratio") -> 0.4)
      val alerts = repo.anomalies(Timestamp.valueOf("2024-01-02 00:00:00"),
        current, maxRelativeChange = 0.5)
      alerts.size shouldBe 1
      alerts.head.message should include("null_ratio")
    }
  }
}
