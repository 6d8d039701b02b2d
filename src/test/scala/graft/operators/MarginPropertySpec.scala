package graft.operators

import org.scalatest.matchers.should.Matchers

import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for margin mining over generated inputs (the
  * DagPropertySpec idiom: deterministic seeds, ground truth recomputed
  * independently per trial). The hand-example and real-embedding replays
  * in TemporalSpec pin specific shapes; this sweeps random ones — ragged
  * sizes, k larger than a side, negative components, coincident vectors
  * (rounded-cosine ties exercising the id tie-break). */
class MarginPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  // independent replay: rounded cosines as integer micro-units, top-k by
  // (cos DESC, id ASC), mutual best, ratio margin (same arithmetic contract
  // as the oracle SQL)
  private def replay(xs: Seq[(Long, Array[Float])], ys: Seq[(Long, Array[Float])],
      k: Int, threshold: Double): Seq[(Long, Long, Double, Double)] = {
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosI(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.round(round6(dot / (math.sqrt(na) * math.sqrt(nb))) * 1e6)
    }
    val scores = for ((xi, xv) <- xs; (yi, yv) <- ys) yield (xi, yi, cosI(xv, yv))
    def tops(byKey: Map[Long, Seq[(Long, Long)]]) =
      byKey.map { case (key, cands) =>
        val top = cands.sortBy { case (id, c) => (-c, id) }.take(k)
        (key, (top.head._1, top.head._2, top.map(_._2).sum, top.size.toLong))
      }
    val fwd = tops(scores.groupBy(_._1).map { case (x, rs) =>
      x -> rs.map(r => (r._2, r._3)) })
    val bwd = tops(scores.groupBy(_._2).map { case (y, rs) =>
      y -> rs.map(r => (r._1, r._3)) })
    (for {
      (x, (bestY, cosXy, sumF, kF)) <- fwd.toSeq
      (bestX, _, sumB, kB) = bwd(bestY)
      if bestX == x
      den = sumF.toDouble / kF + sumB.toDouble / kB
      if den > 0
      margin = round6(2.0 * cosXy / den)
      if margin >= threshold
    } yield (x, bestY, cosXy.toDouble / 1e6, margin)).sortBy(_._1)
  }

  private val Trials = 8

  it("matches the independent replay on random inputs; celled full probe agrees") {
    (1 to Trials).foreach { seed =>
      val rnd = new Random(seed)
      val dim = 2 + rnd.nextInt(7)
      val nx = 1 + rnd.nextInt(30)
      val ny = 1 + rnd.nextInt(30)
      val k = 1 + rnd.nextInt(5)
      val threshold = 0.8 + rnd.nextDouble() * 0.4
      // a few coincident vectors force rounded-cosine ties -> the id
      // tie-break must decide identically in both implementations
      def vec(): Array[Float] = {
        val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
        if (v.forall(_ == 0.0f)) { v(0) = 1.0f }; v
      }
      val pool = Seq.fill(3)(vec())
      def draw(): Array[Float] =
        if (rnd.nextDouble() < 0.25) pool(rnd.nextInt(3)).clone() else vec()
      val xsData = (0 until nx).map(i => (i.toLong, draw()))
      val ysData = (0 until ny).map(i => ((1000 + i).toLong, draw()))
      val xs = xsData.toDF("vec_id", "embedding")
      val ys = ysData.toDF("vec_id", "embedding")
      withClue(s"seed=$seed dim=$dim nx=$nx ny=$ny k=$k thr=$threshold: ") {
        val got = Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
            k, threshold)
          .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
        got shouldBe replay(xsData, ysData, k, threshold)
        // celled at full probe = exact, regardless of the cell layout
        val nCells = 1 + rnd.nextInt(math.min(4, ny))
        val celled = Similarity.marginMinePairsCelled(xs, ys, "vec_id", "embedding",
            k, threshold, nCells = nCells, nProbe = nCells, lloydIters = 1)
          .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
        celled shouldBe got
      }
    }
  }
}
