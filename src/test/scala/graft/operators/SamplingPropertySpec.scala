package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for the deterministic sampling/binning family:
  * the contracts these operators sell — membership decided only by content,
  * splits exhaustive and exclusive, histograms conserving mass — must hold
  * for arbitrary key distributions, not just the unit-test examples.
  * Deterministic seeds; plain Scala recomputations are the ground truth. */
class SamplingPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val Trials = 10

  it("splitByHash is exhaustive, exclusive and growth-stable on random key sets") {
    val rnd = new Random(11)
    (1 to Trials).foreach { _ =>
      // keys from a random band: duplicates and negatives included
      val keys = (1 to 500 + rnd.nextInt(1500))
        .map(_ => rnd.nextInt(10000).toLong - 5000L)
      val fracs = {
        val a = 0.1 + rnd.nextDouble() * 0.7
        val b = rnd.nextDouble() * (0.95 - a)
        Seq("train" -> a, "val" -> b, "test" -> (1.0 - a - b))
      }
      val df = keys.toDF("id")
      val out = Sampling.splitByHash(df, col("id"), fracs)
        .as[(Long, String)].collect()
      out.length shouldBe keys.length // exhaustive: every row assigned
      out.map(_._2).toSet.subsetOf(Set("train", "val", "test")) shouldBe true
      // content-determined: the same key always lands in the same split
      out.groupBy(_._1).values.foreach(_.map(_._2).distinct.length shouldBe 1)
      // growth-stable: assignment of a subset is the full run's restriction
      val half = keys.take(keys.length / 2)
      val sub = Sampling.splitByHash(half.toDF("id"), col("id"), fracs)
        .as[(Long, String)].collect().toMap
      val full = out.toMap
      sub.foreach { case (k, s) => full(k) shouldBe s }
    }
  }

  it("histogram conserves mass and respects bounds on random data") {
    val rnd = new Random(23)
    (1 to Trials).foreach { _ =>
      val lo = rnd.nextDouble() * 10 - 5
      val hi = lo + 0.5 + rnd.nextDouble() * 20
      val nBins = 1 + rnd.nextInt(30)
      val vals = (1 to 200 + rnd.nextInt(800))
        .map(_ => lo - 5 + rnd.nextDouble() * (hi - lo + 10))
      val out = Binning.histogram(vals.toDF("v"), "v", lo, hi, nBins)
        .select("bin", "n").as[(Long, Long)].collect()
      out.length shouldBe nBins + 2 // every bin present, zero-filled
      out.map(_._2).sum shouldBe vals.length // no row lost or double-counted
      // ground truth per bin
      val width = (hi - lo) / nBins
      val expected = vals.groupBy { v =>
        if (v < lo) 0L
        else if (v >= hi) nBins + 1L
        else math.floor((v - lo) / width).toLong + 1L
      }.view.mapValues(_.length.toLong).toMap
      out.foreach { case (bin, n) => n shouldBe expected.getOrElse(bin, 0L) }
    }
  }

  it("leakageSafeSplit never puts a near-dup pair across the split fence") {
    val rnd = new Random(11)
    // 60 docs in 20 clusters of 3 (pairs chain them), plus 15 singletons
    val docs = (1L to 75L).toDF("doc_id")
    val pairs = (0 until 20).flatMap { c =>
      val base = c * 3 + 1L
      Seq((base, base + 1), (base + 1, base + 2))
    }.toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs, "id_a", "id_b",
        Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      .as[(Long, Long, String)].collect()
    out.length shouldBe 75
    val splitOf = out.map(r => r._1 -> r._3).toMap
    // every connected pair shares a split
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      withClue(s"pair ($a,$b): ") { splitOf(a) shouldBe splitOf(b) }
    }
    // all three splits are populated and clusters stay whole
    out.map(_._3).toSet shouldBe Set("train", "val", "test")
    out.groupBy(_._2).foreach { case (_, members) =>
      members.map(_._3).toSet.size shouldBe 1
    }
  }

  it("hashSample of a union equals the union of hashSamples (content membership)") {
    val rnd = new Random(37)
    val a = (1 to 1000).map(_ => rnd.nextInt(100000).toLong).distinct
    val b = (1 to 1000).map(_ => rnd.nextInt(100000).toLong).distinct
    def sample(ks: Seq[Long]) = Sampling.hashSample(ks.toDF("id"), col("id"), 0.37)
      .as[Long].collect().toSet
    sample((a ++ b).distinct) shouldBe (sample(a) union sample(b))
  }

  it("gumbelTopK: exact k, deterministic across partitionings, matches the scala ground truth") {
    val rnd = new Random(53)
    val rows = (1L to 400L).map(id => (id, 0.1 + rnd.nextDouble() * 5))
    val df = rows.toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.gumbelTopK(d, col("id"), log(col("w")), k = 25)
        .select("id").as[Long].collect().toSet
    val sel = run(df)
    sel.size shouldBe 25
    run(df.repartition(13)) shouldBe sel // partitioning-independent
    // ground truth: recompute the gumbel keys in plain scala
    def key(id: Long, w: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(5)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 1048576.0
      math.log(w) - math.log(-math.log(u))
    }
    val expected = rows.sortBy { case (id, w) => -key(id, w) }.take(25).map(_._1).toSet
    sel shouldBe expected
  }

  it("gumbelTopK selection is monotone in weight: boosting a selected row never evicts it") {
    val rows = (1L to 100L).map(id => (id, 1.0))
    val df = rows.toDF("id", "w")
    val base = Sampling.gumbelTopK(df, col("id"), log(col("w")), k = 10)
      .select("id").as[Long].collect().toSet
    // boost one selected row's weight hugely: still selected
    val boosted = rows.map { case (id, w) => (id, if (id == base.head) 1e6 else w) }
    val after = Sampling.gumbelTopK(boosted.toDF("id", "w"), col("id"),
      log(col("w")), k = 10).select("id").as[Long].collect().toSet
    after should contain(base.head)
  }

  it("gumbelTopK plans as a distributed TopK, not a global sort") {
    val df = (1L to 1000L).toDF("id").withColumn("w", lit(1.0))
    val plan = Sampling.gumbelTopK(df, col("id"), log(col("w")), k = 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }
}
