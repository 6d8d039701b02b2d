package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The bounded graft_topk aggregate vs the row_number-window reference. */
class TopKPerKeySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def windowRef(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .where($"rank" <= k)
      .select($"key", $"rank", $"score", $"id")
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
  }

  private val data = (for {
    (key, n) <- Seq("a" -> 50, "b" -> 7, "hot" -> 5000)
    i <- 0 until n
  } yield (key, (i * 31 % 97).toDouble, (key.hashCode.abs * 10000 + i).toLong))
    .toDF("key", "score", "id")

  it("matches the row_number window exactly, ties broken by id") {
    val got = Ranking.topKPerKey(data, Seq($"key"), $"score", $"id", k = 5)
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    got shouldBe windowRef(data, 5)
    // ties exist in the fixture (score = i*31 % 97 repeats); the id
    // tie-break must have decided some of them
    got.groupBy(_._3).exists(_._2.size > 1) shouldBe true
  }

  it("is invariant to partitioning (buffers merge associatively)") {
    val a = Ranking.topKPerKey(data.repartition(13), Seq($"key"), $"score", $"id", 4)
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    val b = Ranking.topKPerKey(data.coalesce(1), Seq($"key"), $"score", $"id", 4)
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    a shouldBe b
  }

  it("groups smaller than k emit all their rows, still ranked") {
    val got = Ranking.topKPerKey(data, Seq($"key"), $"score", $"id", k = 100)
      .as[(String, Long, Double, Long)].collect().toSeq.sorted
    got.count(_._1 == "b") shouldBe 7
    got shouldBe windowRef(data, 100)
  }

  it("aggregates, never windows: no Window node, partial merge present") {
    val p = Ranking.topKPerKey(data, Seq($"key"), $"score", $"id", 3)
      .queryExecution.executedPlan.toString
    p should not include "Window"
    p should include("graft_topk") // the custom aggregate is in the plan
    p.toLowerCase should include("partial") // map-side combine happens
  }
}
