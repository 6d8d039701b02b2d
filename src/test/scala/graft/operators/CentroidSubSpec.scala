package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native graft_centroid_sub expression (sql.CentroidSub) and the
  * Similarity.withCellAndResidual composition that pairs it with
  * graft_cell_assign: exact agreement with the former struct-returning
  * residual UDF, loud dim-drift/cell-range failures, null handling, and
  * codegen participation. */
class CentroidSubSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  /** The exact (cell, residual) loop the Scala UDF ingest path used. */
  private def refResidual(v: Array[Double],
      cents: Array[Array[Double]]): (Int, Array[Double]) = {
    var best = 0; var bestD = Double.MaxValue; var ci = 0
    while (ci < cents.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val x = v(i) - cents(ci)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    (best, v.zip(cents(best)).map { case (x, c) => x - c })
  }

  it("withCellAndResidual equals the UDF formulation on random vectors, ties included") {
    (1 to 15).foreach { seed =>
      val rnd = new Random(seed)
      val dim = 2 + rnd.nextInt(5)
      val nCells = 1 + rnd.nextInt(6)
      val cents = Array.fill(nCells, dim)(rnd.nextInt(3).toDouble)
      val rows = Seq.fill(30)((rnd.nextLong(), Array.fill(dim)(rnd.nextInt(3).toDouble)))
      val out = rows.toDF("id", "v")
        .transform(Similarity.withCellAndResidual(spark, cents, "v", "long"))
        .collect()
      val byId = rows.toMap
      withClue(s"seed=$seed: ") {
        out.foreach { r =>
          val v = byId(r.getLong(0))
          val (cell, res) = refResidual(v, cents)
          r.getLong(2) shouldBe cell.toLong
          r.getSeq[Double](3).toArray shouldBe res
        }
      }
    }
  }

  it("fails loudly on dimension drift") {
    // SHORTER vector: cell-assign compares over its own length (silently
    // truncated there), so the loud failure must come from centroid-sub —
    // a longer vector already throws inside cell-assign's centroid loop
    val cents = Array(Array(0.0, 0.0))
    val df = Seq((1L, Array(1.0))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.transform(Similarity.withCellAndResidual(spark, cents, "v")).collect()
    }
    ex.getMessage should include("does not match centroid dim")
  }

  it("fails loudly on an out-of-range cell") {
    graft.sql.functions.ensureRegistered(spark)
    val df = Seq((Array(1.0), 5)).toDF("v", "c")
    val ex = intercept[Exception] {
      df.select(call_function("graft_centroid_sub", col("v"),
        typedLit(Seq(Seq(0.0))), col("c"))).collect()
    }
    ex.getMessage should include("outside centroid table")
  }

  it("returns null for a null vector") {
    val cents = Array(Array(0.0), Array(5.0))
    val df = Seq((1L, Some(Array(4.0))), (2L, None)).toDF("id", "v")
    val out = df.transform(Similarity.withCellAndResidual(spark, cents, "v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getSeq[Double](3)))).toMap
    out(1L) shouldBe Some(Seq(-1.0))
    out(2L) shouldBe None
  }

  it("compiles into whole-stage codegen (no UDF serialization boundary)") {
    val cents = Array(Array(0.0), Array(5.0))
    val df = spark.range(10)
      .select(col("id"), array(col("id").cast("double")).as("v"))
      .transform(Similarity.withCellAndResidual(spark, cents, "v"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(1)")
    val rows = df.orderBy("id").collect()
    rows.map(_.getInt(2)).toSeq shouldBe (0 until 10).map(i => if (i < 3) 0 else 1)
    rows.map(_.getSeq[Double](3).head).toSeq shouldBe
      (0 until 10).map(i => if (i < 3) i.toDouble else i - 5.0)
  }

  it("rejects a non-foldable centroid table") {
    graft.sql.functions.ensureRegistered(spark)
    val df = Seq((Array(1.0), Array(Array(1.0)), 0)).toDF("v", "t", "c")
    an[Exception] should be thrownBy
      df.select(call_function("graft_centroid_sub", col("v"), col("t"),
        col("c"))).collect()
  }
}
