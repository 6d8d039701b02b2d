package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

import java.sql.Timestamp

class TemporalSpec extends SparkTestBase with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  describe("asofJoin") {

    it("attaches the most recent right row at or before each left timestamp") {
      import spark.implicits._
      val trades = Seq(
        (1L, "A", ts("2024-01-01 10:00:05")),
        (2L, "A", ts("2024-01-01 10:00:20")),
        (3L, "B", ts("2024-01-01 10:00:10")),
        (4L, "B", ts("2024-01-01 09:00:00"))).toDF("trade_id", "sym", "t_ts")
      val quotes = Seq(
        ("A", ts("2024-01-01 10:00:00"), 100.0),
        ("A", ts("2024-01-01 10:00:10"), 101.0),
        ("B", ts("2024-01-01 10:00:10"), 50.0)).toDF("sym", "q_ts", "px")

      val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        payloadCols = Seq("px"))
        .orderBy("trade_id")
        .select("trade_id", "px").as[(Long, Option[Double])].collect()

      out shouldBe Array(
        1L -> Some(100.0), // between the two A quotes -> earlier one
        2L -> Some(101.0), // after both -> latest
        3L -> Some(50.0),  // exactly at quote ts -> inclusive match
        4L -> None)        // before any B quote -> left-outer null
    }

    it("excludes equal timestamps in strict mode") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", ts("2024-01-01 10:00:10"), 7.0)).toDF("sym", "q_ts", "px")
      val inclusive = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head()
      val strict = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"),
        strict = true)
        .select("px").as[Option[Double]].head()
      inclusive shouldBe Some(7.0)
      strict shouldBe None
    }

    it("null right timestamps never match (ASOF semantics)") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", Option.empty[Timestamp], 7.0),
        ("A", Some(ts("2024-01-01 10:00:00")), 9.0)).toDF("sym", "q_ts", "px")
      Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head() shouldBe Some(9.0)
      // with ONLY a null-ts right row, the left row stays unmatched
      val rNull = Seq(("A", Option.empty[Timestamp], 7.0)).toDF("sym", "q_ts", "px")
      Temporal.asofJoin(l, rNull, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head() shouldBe None
    }

    it("null join keys never match on either side") {
      import spark.implicits._
      val l = Seq((1L, Option.empty[String], ts("2024-01-01 10:00:10")),
        (2L, Some("A"), ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq((Option.empty[String], ts("2024-01-01 10:00:00"), 7.0),
        (Some("A"), ts("2024-01-01 10:00:00"), 9.0)).toDF("sym", "q_ts", "px")
      val out = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("id", "px").as[(Long, Option[Double])].collect().toMap
      out shouldBe Map(1L -> None, 2L -> Some(9.0)) // null key matches nothing
    }

    it("rejects payload columns that collide with left columns") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", ts("2024-01-01 10:00:00"), 7.0)).toDF("sym", "q_ts", "id")
      an[IllegalArgumentException] should be thrownBy
        Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("id"))
    }
  }

  describe("intervalJoin") {

    it("matches points to every containing half-open interval, across bucket boundaries") {
      import spark.implicits._
      val points = Seq(
        (1L, ts("2024-01-01 00:30:00")),
        (2L, ts("2024-01-02 12:00:00")),
        (3L, ts("2024-01-05 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(
        // 36h window spanning two day-buckets
        ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-02 12:00:00")),
        ("w2", ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))).toDF("wid", "s", "e")

      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
        .select("pid", "wid").as[(Long, String)].collect().toSet

      // point 2 sits exactly on w1's exclusive end -> only w2; point 3 matches nothing
      out shouldBe Set(1L -> "w1", 2L -> "w2")
    }

    it("ignores inverted intervals instead of exploding the bucket range") {
      import spark.implicits._
      val points = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(
        ("bad", ts("2026-01-01 00:00:00"), ts("1970-01-01 00:00:00")),
        ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"))).toDF("wid", "s", "e")
      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
        .select("wid").as[String].collect().toSeq
      out shouldBe Seq("ok")
    }

    it("produces each matching pair exactly once even when an interval spans many buckets") {
      import spark.implicits._
      val points = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(("long", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")))
        .toDF("wid", "s", "e")
      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
      out.count() shouldBe 1L
    }
  }

  describe("cosineNearDupPairs") {
    it("finds exactly the blocked pairs above the rounded threshold") {
      import spark.implicits._
      val vecs = Seq(
        (1L, Array(1.0f, 0.0f), "x"),
        (2L, Array(0.9f, 0.1f), "x"),
        (3L, Array(-1.0f, 0.0f), "x"),
        (4L, Array(1.0f, 0.0f), "y")).toDF("id", "vec", "blk")
      val out = Similarity.cosineNearDupPairs(vecs, "id", "vec", col("blk"), 0.9)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // (1,2) similar same block; (1,4) identical but different blocks; (1,3) opposite
      out shouldBe Set(1L -> 2L)
    }
  }
}
