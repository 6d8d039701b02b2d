package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class CorrelationsSpec extends SparkTestBase with org.scalatest.matchers.should.Matchers {
  import spark.implicits._

  it("recovers known correlations, listwise-deletes nulls, nulls constants") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map { _ =>
      val x = rnd.nextDouble() * 10
      (x, 3.0 * x + 1.0, rnd.nextDouble(), 7.0) // y = 3x+1 exactly, z noise, k const
    }
    val df = rows.toDF("x", "y", "z", "k")
    val out = Profile.correlations(df, Seq("x", "y", "z", "k"))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    out(("x", "y"))._2.get shouldBe 1.0 +- 1e-6 // perfectly linear
    math.abs(out(("x", "z"))._2.get) should be < 0.1 // independent
    out(("x", "k"))._2 shouldBe None // constant column: no direction
    // listwise deletion: a null row drops from EVERY pair's n
    val withNull = df.unionByName(
      Seq((Option.empty[Double], Option(1.0), Option(1.0), Option(7.0)))
        .toDF("x", "y", "z", "k"))
    val n2 = Profile.correlations(withNull, Seq("x", "y", "z", "k"))
      .select("n").as[Long].collect()
    n2.toSet shouldBe Set(2000L)
    an[IllegalArgumentException] should be thrownBy
      Profile.correlations(df, Seq("x"))
  }
}

class ProfileSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(2.5))).toDF("id", "s", "v")

  describe("profile") {

    it("computes counts, nulls, distincts and ranges per column") {
      val out = Profile.profile(df, Seq("id", "s", "v"))
        .as[(String, Long, Long, Long, String, String)].collect()
        .map(r => r._1 -> r).toMap
      out("id") shouldBe (("id", 4L, 0L, 4L, "1", "4"))
      out("s") shouldBe (("s", 4L, 1L, 2L, "a", "b"))
      out("v") shouldBe (("v", 4L, 1L, 2L, "1.5", "2.5"))
    }

    it("exact path plans one column-pruned scan per column and NO Expand (r14)") {
      // the round-13 shape (one Expand×k aggregate) multiplied every input
      // row by k and re-shuffled the expanded rows per distinct column —
      // the suite's slowest sf1 row; the split unions k single-distinct
      // aggregates instead, each its own pruned scan
      val plan = Profile.profile(df, Seq("id", "s", "v"))
        .queryExecution.executedPlan.toString
      plan should not include "Expand"
      "LocalTableScan|Scan".r.findAllIn(plan).size shouldBe 3
    }

    it("approx mode is a true single pass: one scan, no Expand") {
      val approx = Profile.profile(df, Seq("id", "s"), approxDistinct = true)
        .queryExecution.executedPlan.toString
      approx should not include "Expand"
      "LocalTableScan|Scan".r.findAllIn(approx).size shouldBe 1
      // approx counts are exact at this cardinality
      Profile.profile(df, Seq("id"), approxDistinct = true)
        .select("n_distinct").as[Long].head() shouldBe 4L
    }

    it("rejects an empty column list and unknown columns") {
      an[IllegalArgumentException] should be thrownBy Profile.profile(df, Seq.empty)
      an[IllegalArgumentException] should be thrownBy Profile.profile(df, Seq("nope"))
    }

    it("handles column names with dots, spaces and quotes (no SQL splicing)") {
      val weird = df.withColumnRenamed("id", "order key")
        .withColumnRenamed("s", "a.b")
        .withColumnRenamed("v", "it's")
      val out = Profile.profile(weird, Seq("order key", "a.b", "it's"))
        .as[(String, Long, Long, Long, String, String)].collect()
        .map(r => r._1 -> r).toMap
      out("order key")._4 shouldBe 4L
      out("a.b")._3 shouldBe 1L     // one null
      out("it's")._6 shouldBe "2.5" // max survives the quote
    }
  }
}
