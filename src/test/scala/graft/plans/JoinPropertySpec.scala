package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for the native join execs over random data — the
  * per-partition merge loops (lookahead, carry state, key-change reset,
  * lazy expiry) are the subtlest imperative code in the engine, so they
  * are compared against in-memory brute force on generated inputs with
  * adversarial tie/duplicate density and random pre-partitioning, not just
  * the hand-picked spec examples. Deterministic seeds. */
class JoinPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val Trials = 30

  private def genSide(rnd: Random, n: Int, keys: Int, times: Int): Seq[(String, Long)] =
    Seq.fill(n)((s"k${rnd.nextInt(keys)}", rnd.nextInt(times).toLong))

  it("as-of backward/forward with and without tolerance equals brute force") {
    (1 to Trials).foreach { seed =>
      val rnd = new Random(seed)
      // small domains force key collisions and exact-time ties
      val lRows = genSide(rnd, 1 + rnd.nextInt(30), 4, 12).distinct
      val rRows = genSide(rnd, 1 + rnd.nextInt(30), 4, 12).distinct // unique (k,t): determinism contract
      val l = lRows.toDF("k", "t").repartition(1 + rnd.nextInt(4))
      val r = rRows.map { case (k, t) => (k, t, t * 10 + k.last.toLong) }
        .toDF("rk", "rt", "pay").repartition(1 + rnd.nextInt(4))
      // both physical regimes must equal brute force on every seed
      for (fwd <- Seq(false, true); tol <- Seq(None, Some(3L));
           hint <- Seq(Some(true), Some(false))) {
        val got = AsOf.asOfJoin(l, r, Seq("k"), Seq("rk"), "t", "rt",
            direction = if (fwd) "forward" else "backward", tolerance = tol,
            broadcastRight = hint)
          .select($"k", $"t", $"rt").as[(String, Long, Option[Long])]
          .collect().map(x => (x._1, x._2) -> x._3).toMap
        lRows.foreach { case (k, t) =>
          val cands = rRows.filter(_._1 == k).map(_._2)
            .filter(rt => if (fwd) rt >= t else rt <= t)
            .filter(rt => tol.forall(tv => math.abs(rt - t) <= tv))
          val want = if (cands.isEmpty) None
            else Some(if (fwd) cands.min else cands.max)
          withClue(s"seed=$seed fwd=$fwd tol=$tol broadcast=$hint left=($k,$t): ") {
            got((k, t)) shouldBe want
          }
        }
      }
    }
  }

  it("interval join equals the brute-force containment filter") {
    (1 to Trials).foreach { seed =>
      val rnd = new Random(seed)
      val pts = genSide(rnd, 1 + rnd.nextInt(30), 4, 15).distinct
      val ivs = Seq.fill(1 + rnd.nextInt(20)) {
        val s = rnd.nextInt(15).toLong
        // includes degenerate (e <= s) intervals, which must match nothing
        (s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(7) - 1, rnd.nextLong())
      }.distinct
      val p = pts.toDF("k", "t").repartition(1 + rnd.nextInt(4))
      val iv = ivs.toDF("ik", "s", "e", "tag").repartition(1 + rnd.nextInt(4))
      val want = (for {
        (k, t) <- pts
        (ik, s, e, tag) <- ivs
        if ik == k && s < e && s <= t && t < e
      } yield (k, t, tag)).sorted
      // both physical regimes must equal brute force on every seed
      for (hint <- Seq(Some(true), Some(false))) {
        val got = IntervalJoin.intervalJoin(p, iv, Seq("k"), Seq("ik"),
            "t", "s", "e", hint)
          .select($"k", $"t", $"tag").as[(String, Long, Long)]
          .collect().sorted
        withClue(s"seed=$seed broadcast=$hint: ") { got shouldBe want }
      }
    }
  }

  it("salted variants equal brute force on every seed") {
    // the salted wrappers (operators.Skew) reroute through (key, salt)
    // clustering with a replicated right side — same brute-force ground
    // truth as the unsalted paths, including exact-time ties and
    // degenerate intervals
    (1 to 15).foreach { seed =>
      val rnd = new Random(seed + 1000)
      val lRows = genSide(rnd, 1 + rnd.nextInt(30), 4, 12).distinct
      val rRows = genSide(rnd, 1 + rnd.nextInt(30), 4, 12).distinct
      val l = lRows.toDF("k", "t").repartition(1 + rnd.nextInt(4))
      val r = rRows.map { case (k, t) => (k, t, t * 10 + k.last.toLong) }
        .toDF("rk", "rt", "pay").repartition(1 + rnd.nextInt(4))
      for (fwd <- Seq(false, true); tol <- Seq(None, Some(3L))) {
        val got = graft.operators.Skew.saltedAsOfJoin(l, r,
            Seq("k"), Seq("rk"), "t", "rt",
            direction = if (fwd) "forward" else "backward", tolerance = tol,
            saltBuckets = 1 + rnd.nextInt(8))
          .select($"k", $"t", $"rt").as[(String, Long, Option[Long])]
          .collect().map(x => (x._1, x._2) -> x._3).toMap
        lRows.foreach { case (k, t) =>
          val cands = rRows.filter(_._1 == k).map(_._2)
            .filter(rt => if (fwd) rt >= t else rt <= t)
            .filter(rt => tol.forall(tv => math.abs(rt - t) <= tv))
          val want = if (cands.isEmpty) None
            else Some(if (fwd) cands.min else cands.max)
          withClue(s"seed=$seed fwd=$fwd tol=$tol left=($k,$t): ") {
            got((k, t)) shouldBe want
          }
        }
      }
      val pts = genSide(rnd, 1 + rnd.nextInt(30), 4, 15).distinct
      val ivs = Seq.fill(1 + rnd.nextInt(20)) {
        val s = rnd.nextInt(15).toLong
        (s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(7) - 1, rnd.nextLong())
      }.distinct
      val p = pts.toDF("k", "t").repartition(1 + rnd.nextInt(4))
      val iv = ivs.toDF("ik", "s", "e", "tag").repartition(1 + rnd.nextInt(4))
      val want = (for {
        (k, t) <- pts
        (ik, s, e, tag) <- ivs
        if ik == k && s < e && s <= t && t < e
      } yield (k, t, tag)).sorted
      val got = graft.operators.Skew.saltedIntervalJoin(p, iv,
          Seq("k"), Seq("ik"), "t", "s", "e", saltBuckets = 1 + rnd.nextInt(8))
        .select($"k", $"t", $"tag").as[(String, Long, Long)]
        .collect().sorted
      withClue(s"seed=$seed interval: ") { got shouldBe want }
    }
  }
}
