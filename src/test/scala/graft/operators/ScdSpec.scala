package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

import graft.SparkTestBase

class ScdSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val changes = Seq(
    // user 1: a -> a (dup, compressed) -> b -> b (dup) -> c
    (1L, ts("2024-01-01 00:00:00"), "a"),
    (1L, ts("2024-01-02 00:00:00"), "a"),
    (1L, ts("2024-01-03 00:00:00"), "b"),
    (1L, ts("2024-01-04 00:00:00"), "b"),
    (1L, ts("2024-01-05 00:00:00"), "c"),
    // user 2: single observation
    (2L, ts("2024-02-01 00:00:00"), "x"),
    // user 3: null-to-value flip opens a version (null-safe compare)
    (3L, ts("2024-03-01 00:00:00"), null),
    (3L, ts("2024-03-02 00:00:00"), "y")
  ).toDF("uid", "at", "state")

  describe("scd2FromChanges") {

    it("compresses runs and builds correct intervals") {
      val hist = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6))
      hist shouldBe Array(
        (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false, 1L),
        (1L, "b", ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), false, 2L),
        (1L, "c", ts("2024-01-05 00:00:00"), None, true, 3L),
        (2L, "x", ts("2024-02-01 00:00:00"), None, true, 1L),
        (3L, null, ts("2024-03-01 00:00:00"), Some(ts("2024-03-02 00:00:00")), false, 1L),
        (3L, "y", ts("2024-03-02 00:00:00"), None, true, 2L))
    }

    it("builds the whole history in a single shuffle") {
      val plan = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
        .queryExecution.executedPlan.toString()
      "Exchange".r.findAllIn(plan).size shouldBe 1
    }
  }

  describe("scd2Merge") {

    it("incremental merge equals the one-shot history") {
      val first = changes.where(col("at") < lit(ts("2024-01-04 00:00:00")))
      val rest  = changes.where(col("at") >= lit(ts("2024-01-04 00:00:00")))
      val dim = Scd.scd2FromChanges(first, Seq("uid"), "at", Seq("state"))
      val merged = Scd.scd2Merge(dim, rest, Seq("uid"), "at", Seq("state"))
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6))
      val oneShot = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6))
      merged shouldBe oneShot
    }

    it("splices retroactive observations instead of corrupting the tail") {
      val late = Seq((1L, ts("2024-01-02 12:00:00"), "z")).toDF("uid", "at", "state")
      val dim = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
      val merged = Scd.scd2Merge(dim, late, Seq("uid"), "at", Seq("state"))
        .where(col("uid") === 1L)
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(_._6)
      merged.map(_._2) shouldBe Array("a", "z", "b", "c")
      // interval chain stays contiguous: each valid_to = next valid_from
      merged.sliding(2).foreach { case Array(cur, nxt) =>
        cur._4 shouldBe Some(nxt._3)
      }
      merged.last._4 shouldBe None
      merged.last._5 shouldBe true
    }

    it("re-delivered observations are a no-op") {
      val dim = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
      val again = Scd.scd2Merge(dim, changes.select("uid", "at", "state"),
        Seq("uid"), "at", Seq("state"))
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6))
      val base = dim
        .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
        .collect().sortBy(r => (r._1, r._6))
      again shouldBe base
    }

    it("rejects a tie-break the dimension cannot carry") {
      val dim = Scd.scd2FromChanges(changes, Seq("uid"), "at", Seq("state"))
      an[IllegalArgumentException] should be thrownBy
        Scd.scd2Merge(dim, changes, Seq("uid"), "at", Seq("state"),
          tieBreak = Seq("event_id"))
    }
  }

  describe("snapshotDiff") {
    it("classifies added/removed/changed, drops unchanged, null-safe") {
      val before = Seq(
        (1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]), (4L, Some("d")))
        .toDF("id", "v")
      val after = Seq(
        (1L, Some("a")),                 // unchanged -> dropped
        (2L, Some("B")),                 // changed
        (3L, Some("c")),                 // null -> value = changed
        (5L, Some("e")))                 // added; 4 removed
        .toDF("id", "v")
      val out = Scd.snapshotDiff(before, after, Seq("id"), Seq("v"))
        .orderBy("id")
        .as[(Long, Option[String], Option[String], String)].collect().toSeq
      out shouldBe Seq(
        (2L, Some("b"), Some("B"), "changed"),
        (3L, None, Some("c"), "changed"),
        (4L, Some("d"), None, "removed"),
        (5L, None, Some("e"), "added"))
    }
  }
}
