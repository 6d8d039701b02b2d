package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for the exact-integer z-order tier: the contracts
  * the layout sells — the Morton key is a linear extension of the
  * per-dimension dominance order (so per-file key ranges bound every
  * clustered column), keys depend only on each value's offset inside its
  * span (stats-relative), and equal points collapse to equal keys — must
  * hold for arbitrary ranges, not just the unit-test grids. Deterministic
  * seeds; plain Scala recomputations are the ground truth. */
class LayoutPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val Trials = 8

  it("zValue is monotone under per-dimension dominance on random ranges") {
    val rnd = new Random(19)
    (1 to Trials).foreach { _ =>
      // spans from degenerate to 2^45, mixed signs, duplicates included
      val aSpan = 1L << (rnd.nextInt(45) + 1)
      val bSpan = 1L << (rnd.nextInt(45) + 1)
      val aOff = rnd.nextLong() % (1L << 40)
      val bOff = rnd.nextLong() % (1L << 40)
      val rows = Seq.fill(300)(
        (aOff + rnd.nextLong().abs % aSpan, bOff + rnd.nextLong().abs % bSpan))
      val keyed = Layout.zValue(rows.toDF("a", "b"), Seq("a", "b"), bits = 16)
        .as[(Long, Long, Long)].collect()
      // dominance (a1<=a2 && b1<=b2) must imply z1 <= z2 — checked over a
      // random sample of pairs (full n^2 is wasteful, 3000 pairs suffice)
      (1 to 3000).foreach { _ =>
        val p = keyed(rnd.nextInt(keyed.length))
        val q = keyed(rnd.nextInt(keyed.length))
        if (p._1 <= q._1 && p._2 <= q._2)
          assert(p._3 <= q._3,
            s"dominated point ($p) keyed above dominating ($q)")
      }
      // equal points collapse to equal keys
      keyed.groupBy(r => (r._1, r._2)).values
        .foreach(_.map(_._3).distinct.length shouldBe 1)
    }
  }

  it("zValue is invariant under per-column translation (stats-relative)") {
    val rnd = new Random(23)
    (1 to Trials).foreach { _ =>
      val rows = Seq.fill(200)(
        (rnd.nextLong().abs % (1L << 30), rnd.nextLong().abs % (1L << 52)))
      val base = Layout.zValue(rows.toDF("a", "b"), Seq("a", "b"), bits = 14)
        .select("z_value").as[Long].collect().toSeq
      val (da, db) = (rnd.nextLong() % (1L << 40), rnd.nextLong() % (1L << 40))
      val shifted = Layout.zValue(
        rows.map { case (a, b) => (a + da, b + db) }.toDF("a", "b"),
        Seq("a", "b"), bits = 14)
        .select("z_value").as[Long].collect().toSeq
      shifted shouldBe base
    }
  }
}
