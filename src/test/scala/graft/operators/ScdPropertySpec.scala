package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp
import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for SCD2 over random change logs: the merge path
  * re-opens dimension rows as observations and rebuilds, so the invariant
  * "any split of the log, merged incrementally, equals the one-shot build"
  * must hold for every interleaving — including retroactive updates and
  * re-deliveries, which hand-picked examples under-cover. Deterministic
  * seeds; a plain in-memory reference implementation is the ground truth. */
class ScdPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val Trials = 20

  private type Obs = (Long, Timestamp, String)
  private type Hist = Seq[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]

  private def randomLog(rnd: Random): Seq[Obs] =
    (1 to 1 + rnd.nextInt(60)).map { _ =>
      val uid = 1L + rnd.nextInt(4)
      // coarse timestamps force plenty of adjacent-equal states and
      // distinct-ts collisions across users
      val ts = new Timestamp(86400000L * (1 + rnd.nextInt(20)))
      val state = s"s${rnd.nextInt(3)}"
      (uid, ts, state)
    }.distinct // same (uid, ts) twice with different states is genuinely ambiguous
      .groupBy(o => (o._1, o._2)).map(_._2.head).toSeq // keep one obs per (uid, ts)

  /** In-memory reference: per key, order by ts, compress runs, interval-ise. */
  private def reference(log: Seq[Obs]): Hist =
    log.groupBy(_._1).toSeq.flatMap { case (uid, obs) =>
      val ordered = obs.sortBy(_._2.getTime)
      val compressed = ordered.foldLeft(Vector.empty[Obs]) { (acc, o) =>
        if (acc.nonEmpty && acc.last._3 == o._3) acc else acc :+ o
      }
      compressed.zipWithIndex.map { case ((_, ts, st), i) =>
        val validTo = compressed.lift(i + 1).map(_._2)
        (uid, st, ts, validTo, validTo.isEmpty, (i + 1).toLong)
      }
    }

  private def build(log: Seq[Obs]): Hist =
    Scd.scd2FromChanges(log.toDF("uid", "at", "state"), Seq("uid"), "at", Seq("state"))
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().toSeq

  private def canon(h: Hist): Seq[Any] = h.sortBy(r => (r._1, r._6))

  describe("scd2 over random change logs") {

    it("one-shot build matches the in-memory reference") {
      (1 to Trials).foreach { seed =>
        val log = randomLog(new Random(seed))
        withClue(s"seed=$seed n=${log.size}: ") {
          canon(build(log)) shouldBe canon(reference(log))
        }
      }
    }

    it("time-split incremental merges equal the one-shot history at any cut") {
      // in-order delivery (each batch newer than the last) is the realistic
      // ingest and must be EXACTLY one-shot-equivalent at every cut point;
      // rows are shuffled WITHIN batches — order inside a delivery is free.
      // (Fully out-of-order delivery is equivalent except when a retro
      // observation lands inside a compressed equal-state run — compression
      // discards the run's re-confirmations, so that re-transition is
      // unrecoverable; the scd2Merge scaladoc documents this.)
      (1 to Trials).foreach { seed =>
        val rnd = new Random(1000 + seed)
        val log = randomLog(rnd)
        val cutTs = 86400000L * (1 + rnd.nextInt(20))
        val first = rnd.shuffle(log.filter(_._2.getTime < cutTs))
        val rest = rnd.shuffle(log.filter(_._2.getTime >= cutTs))
        val oneShot = canon(build(log))
        val merged =
          if (first.isEmpty) build(rest)
          else Scd.scd2Merge(
            Scd.scd2FromChanges(first.toDF("uid", "at", "state"),
              Seq("uid"), "at", Seq("state")),
            rest.toDF("uid", "at", "state"),
            Seq("uid"), "at", Seq("state"))
            .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
            .collect().toSeq
        withClue(s"seed=$seed cutTs=$cutTs of ${log.size}: ") {
          canon(merged) shouldBe oneShot
        }
      }
    }
  }
}
