package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native graft_subvec_assign expression (sql.SubvecAssign), the PQ
  * encode hot path: exact agreement with the former UDF formulation
  * (argmin over copyOfRange slices) on adversarial random inputs — small
  * integer components force exact distance ties, strict-< argmin must keep
  * the lowest index in both — plus the loud dim-drift contract, null
  * handling, codegen participation, and the foldable-argument contract. */
class SubvecAssignSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  /** The exact slice-and-argmin loop the Scala UDF encoder used. */
  private def refCode(v: Array[Double], cb: Array[Array[Double]],
      off: Int): Int = {
    val subDim = cb.head.length
    val sub = java.util.Arrays.copyOfRange(v, off, off + subDim)
    var best = 0; var bestD = Double.MaxValue; var ci = 0
    while (ci < cb.length) {
      var d = 0.0; var i = 0
      while (i < subDim) { val x = sub(i) - cb(ci)(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  private def subvec(cb: Array[Array[Double]], off: Int, dim: Int)(
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    graft.sql.functions.ensureRegistered(spark)
    call_function("graft_subvec_assign", v.cast("array<double>"),
      typedLit(cb.map(_.toSeq).toSeq), lit(off), lit(dim))
  }

  it("equals the UDF slice-argmin on random vectors across all subspaces, ties included") {
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed)
      val m = 1 + rnd.nextInt(4)
      val subDim = 1 + rnd.nextInt(3)
      val dim = m * subDim
      val k = 1 + rnd.nextInt(8)
      // components in {0,1,2}: many exact-tie distances across centroids
      val cbs = Array.fill(m, k, subDim)(rnd.nextInt(3).toDouble)
      val rows = Seq.fill(40)((rnd.nextLong(), Array.fill(dim)(rnd.nextInt(3).toDouble)))
      val df = rows.toDF("id", "v")
      val out = df.select(col("id") +:
          (0 until m).map(j => subvec(cbs(j), j * subDim, dim)(col("v")).as(s"c_$j")): _*)
        .collect()
      val byId = rows.toMap
      withClue(s"seed=$seed: ") {
        out.foreach { r =>
          val v = byId(r.getLong(0))
          (0 until m).foreach { j =>
            r.getInt(1 + j) shouldBe refCode(v, cbs(j), j * subDim)
          }
        }
      }
    }
  }

  it("fails loudly on dimension drift instead of zero-padding") {
    val cb = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val df = Seq((1L, Array(0.5, 0.5, 0.5))).toDF("id", "v") // dim 3, expect 4
    val ex = intercept[Exception] {
      df.select(subvec(cb, 0, 4)(col("v"))).collect()
    }
    ex.getMessage should include("does not match expected dim")
  }

  it("returns null for a null vector") {
    val cb = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val df = Seq((1L, Some(Array(0.9, 0.9))), (2L, None)).toDF("id", "v")
    val out = df.select(col("id"), subvec(cb, 0, 2)(col("v")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    out(1L) shouldBe Some(1)
    out(2L) shouldBe None
  }

  it("compiles into whole-stage codegen (no UDF serialization boundary)") {
    val cb = Array(Array(0.0), Array(5.0))
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(9.0)).as("v"))
      .select(subvec(cb, 0, 2)(col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(1)") // whole-stage codegen span covers the project
    df.as[Int].collect().toSeq shouldBe (0 until 10).map(i => if (i < 3) 0 else 1)
  }

  it("rejects a non-foldable codebook") {
    graft.sql.functions.ensureRegistered(spark)
    val df = Seq((Array(1.0), Array(Array(1.0)))).toDF("v", "t")
    an[Exception] should be thrownBy
      df.select(call_function("graft_subvec_assign", col("v"), col("t"),
        lit(0), lit(1))).collect()
  }

  it("Quantization.encode emits identical codes to the UDF formulation") {
    val rnd = new Random(7)
    val dim = 8; val m = 4; val subDim = dim / m
    val rows = Seq.tabulate(60)(i => (i.toLong, Array.fill(dim)(rnd.nextInt(4).toDouble)))
    val corpus = rows.toDF("vec_id", "embedding")
    val model = Quantization.train(corpus, "vec_id", "embedding", dim, m, k = 8,
      lloydIters = 2)
    val native = Quantization.encode(corpus, "vec_id", "embedding", model)
      .orderBy("vec_id").collect()
    val byId = rows.toMap
    native.foreach { r =>
      val v = byId(r.getLong(0))
      (0 until m).foreach { j =>
        r.getLong(1 + j) shouldBe refCode(v, model.codebooks(j), j * subDim).toLong
      }
    }
  }
}
