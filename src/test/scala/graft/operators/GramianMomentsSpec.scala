package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The graft_gramian bounded moment aggregate (sql.GramianMoments): exact
  * agreement with the posexplode expression formulation it replaces (the
  * DuckDB-oracle contract), partitioning invariance, the qRound boundary
  * semantics, and edge cases. */
class GramianMomentsSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val Q9 = 1.0e9

  /** The former expression formulation, verbatim: exploded first moments
    * and upper-triangle products with per-term round()×1e9 long sums. */
  private def viaExplode(df: org.apache.spark.sql.DataFrame,
      vecCol: String): (Map[Int, Long], Long, Map[(Int, Int), Long]) = {
    val ex = df.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("i"), col("x").cast("double").as("x"))
    val means = ex.groupBy(col("i"))
      .agg(sum(round(col("x") * Q9).cast("long")).as("s9"),
        count(lit(1)).as("c")).collect()
    val prods = df.select(col(vecCol).as("_v"),
        posexplode(col(vecCol)).as(Seq("i", "xi")))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("_v")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(round(col("xi") * col("xj").cast("double") * Q9).cast("long"))
        .as("sp9")).collect()
    (means.map(r => r.getInt(0) -> r.getLong(1)).toMap,
      means.head.getLong(2),
      prods.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap)
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame,
      vecCol: String): Seq[Long] = {
    graft.sql.functions.ensureRegistered(spark)
    df.agg(call_function("graft_gramian", col(vecCol).cast("array<double>")))
      .head().getSeq[Long](0)
  }

  it("equals the posexplode formulation exactly on random vectors") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val d = 2 + rnd.nextInt(5)
      val rows = Seq.fill(80)(Tuple1(Array.fill(d)(
        (rnd.nextInt(4001) - 2000) / 1000.0)))
      val df = rows.toDF("v").repartition(1 + rnd.nextInt(6))
      val (s9, n, sp9) = viaExplode(df, "v")
      val m = viaAgg(df, "v")
      withClue(s"seed=$seed: ") {
        m(0) shouldBe d.toLong
        m(1) shouldBe n
        (0 until d).foreach(i => m(2 + i) shouldBe s9(i))
        var t = 2 + d
        for (i <- 0 until d; j <- i until d) {
          m(t) shouldBe sp9((i, j))
          t += 1
        }
      }
    }
  }

  it("qRound matches the round().cast(long) semantics on boundary values") {
    graft.sql.functions.ensureRegistered(spark)
    val vals = Seq(2.5, -2.5, 3.5, -3.5, 0.5, -0.5, 2.4999999, 2.5000001,
      1.0e15 + 0.5, -(1.0e15 + 0.5), 7.499999999999999, 123456789.5,
      0.049999999999999996 * 1e2) // decimal-repr .5 boundaries included
    val df = vals.toDF("t")
    val sparkRounded = df.select(round(col("t")).cast("long")).as[Long].collect()
    vals.zip(sparkRounded).foreach { case (t, expect) =>
      withClue(s"t=$t: ") {
        graft.sql.GramianMoments.qRound(t) shouldBe expect
      }
    }
  }

  it("skips null vectors, counts rows with null elements, errors on ragged input") {
    val withNullRow = Seq(Some(Array(1.0, 2.0)), None, Some(Array(3.0, 4.0)))
      .toDF("v")
    val m = viaAgg(withNullRow, "v")
    m(1) shouldBe 2L // null vector skipped
    m(2) shouldBe math.round(1.0 * Q9) + math.round(3.0 * Q9)

    val ragged = Seq(Tuple1(Array(1.0, 2.0)), Tuple1(Array(1.0))).toDF("v")
    val ex = intercept[Exception] { viaAgg(ragged, "v") }
    ex.getMessage should include("ragged")
  }

  it("returns an empty array over empty input") {
    viaAgg(Seq.empty[Tuple1[Array[Double]]].toDF("v"), "v") shouldBe empty
  }

  it("Pca.principalComponent is unchanged through the swap (same loadings)") {
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val o = ((i * 37) % 11 - 5) / 50.0
      Tuple1(Array((t + o).toFloat, (t - o).toFloat))
    }
    val out = Pca.principalComponent(pts.toDF("embedding"), "embedding",
      iterations = 6).orderBy("pos").collect()
    out.map(_.getAs[Double]("loading")).foreach(_ shouldBe 0.7071 +- 0.01)
  }
}
