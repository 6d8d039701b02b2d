package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native interval join: containment semantics (half-open, overlap
  * fan-out, key isolation, null/degenerate handling) in BOTH physical
  * regimes (broadcast-intervals and sorted-merge), agreement with the
  * bucketed composition on real data, and both plan shapes (broadcast:
  * zero shuffles/sorts; SMJ: one exchange + sort per side, no interval
  * replication). */
class IntervalJoinSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def intervals = Seq(
    ("A", 10L, 20L, "a1"), ("A", 15L, 30L, "a2"), ("A", 40L, 41L, "a3"),
    ("B", 0L, 100L, "b1"),
    ("C", 5L, 6L, "c1")).toDF("i_key", "i_start", "i_end", "i_tag")

  private def points = Seq(
    ("A", 9L), ("A", 10L), ("A", 17L), ("A", 20L), ("A", 40L),
    ("B", 50L),
    ("D", 1L)).toDF("k", "t")

  // both physical regimes must agree on every semantic property: the hint
  // forces the regime regardless of the tiny test sizes
  private val regimes = Seq("broadcast" -> Some(true), "sort-merge" -> Some(false))

  private def joinAll(hint: Option[Boolean]) =
    IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end", hint)
      .select($"k", $"t", $"i_tag").as[(String, Long, String)]
      .collect().sortBy(r => (r._1, r._2, r._3))

  it("pairs each point with every containing interval, half-open") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      joinAll(hint) shouldBe Array(
        ("A", 10L, "a1"), // start inclusive
        ("A", 17L, "a1"), ("A", 17L, "a2"), // overlap fan-out
        ("A", 20L, "a2"), // end exclusive: a1 no longer matches at 20
        ("A", 40L, "a3"),
        ("B", 50L, "b1"))
      // dropped: ("A",9) before any start, ("D",1) keyless, C pointless
    }
  }

  it("never matches across keys even when times overlap") {
    // B's [0,100) spans every A point time; none may leak
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      joinAll(hint).filter(_._1 == "A").map(_._3).toSet shouldBe
        Set("a1", "a2", "a3")
    }
  }

  it("drops null and degenerate (end <= start) interval rows") {
    val iv = Seq((Some("A"), Some(10L), Some(20L)), (None, Some(0L), Some(99L)),
      (Some("A"), None, Some(99L)), (Some("A"), Some(30L), Some(30L)),
      (Some("A"), Some(50L), Some(40L))).toDF("i_key", "i_start", "i_end")
    val p = Seq(("A", 15L), ("A", 30L), ("A", 45L)).toDF("k", "t")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = IntervalJoin.intervalJoin(p, iv, Seq("k"), Seq("i_key"),
        "t", "i_start", "i_end", hint).select($"t").as[Long].collect()
      out shouldBe Array(15L) // only the real [10,20) interval matches
    }
  }

  it("agrees with the bucketed compositional interval join on real data") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val base = events.select($"event_id", $"user_id",
      col("ts").cast("timestamp").as("ts"), $"event_type")
    val p = base.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val iv = base.where($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_start")).distinct()
      .withColumn("c_end", $"c_start" + expr("INTERVAL 30 MINUTES"))
    // compose: the bucketed operator is unkeyed, so key-filter its output
    val composed = graft.operators.Temporal.intervalJoin(
      p, "ts", iv.withColumnRenamed("c_user", "user_id2"),
      "c_start", "c_end", bucketWidthSec = 3600L)
      .where($"user_id" === $"user_id2")
      .select($"event_id", $"c_start")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val native = IntervalJoin.intervalJoin(p, iv, Seq("user_id"),
        Seq("c_user"), "ts", "c_start", "c_end", hint)
        .select($"event_id", $"c_start")
      native.exceptAll(composed).count() shouldBe 0
      composed.exceptAll(native).count() shouldBe 0
      native.count() should be > 0L
    }
  }

  it("SMJ regime plans one exchange and one sort per side — no interval replication") {
    val plan = IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end", Some(false))
      .queryExecution.executedPlan.toString
    plan should include("IntervalJoin")
    plan should not include "BroadcastIntervalJoin"
    "Exchange".r.findAllIn(plan).length shouldBe 2
    "(?i)\\bsort\\b".r.findAllIn(plan).length shouldBe 2
    plan should not include "Generate" // no explode/sequence bucketing
  }

  it("broadcast regime never shuffles or sorts the point side") {
    val plan = IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end", Some(true))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastIntervalJoin")
    plan should include("BroadcastExchange")
    // the ONLY exchange is the broadcast one; nothing shuffles, nothing sorts
    "Exchange".r.findAllIn(plan).length shouldBe 1
    "(?i)\\bsort\\b".r.findAllIn(plan).length shouldBe 0
  }

  it("the size estimate picks broadcast for a tiny interval side, SMJ past the threshold") {
    // tiny local relations sit far under the default 10MB threshold
    val auto = IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end")
      .queryExecution.executedPlan.toString
    auto should include("BroadcastIntervalJoin")
    // same plan with broadcasting disabled must fall back to sort-merge
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = IntervalJoin.intervalJoin(points, intervals,
        Seq("k"), Seq("i_key"), "t", "i_start", "i_end")
        .queryExecution.executedPlan.toString
      smj should include("IntervalJoin")
      smj should not include "BroadcastIntervalJoin"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  it("a downstream per-key aggregate reuses the SMJ join's output partitioning") {
    // outputPartitioning = left.outputPartitioning (same contract as the
    // as-of exec): groupBy(k) after the join needs NO third exchange — 2
    // total, one per join side — the cross-stage reuse the bucketed
    // composition's post-explode partitioning cannot declare
    val agg = IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end", Some(false))
      .groupBy($"k").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length shouldBe 2
    agg.collect().length should be > 0
  }

  it("AQE flips SMJ to broadcast at RUNTIME when the interval side materializes small") {
    // same runtime regime conversion as the as-of spec: static post-agg
    // estimate too big -> initial SMJ; materialized stage stats tiny ->
    // re-planned BroadcastIntervalJoinExec mid-query
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val p = spark.range(200000).select((col("id") % 200).as("k"), col("id").as("t"))
      val ivBig = spark.range(200000).select((col("id") % 200).as("ik"),
        ((col("id") % 50) * 10000).as("s0"), rand(7).as("v"))
      val iv = ivBig.groupBy(col("ik"), col("s0")).agg(count(lit(1)).as("n"))
        .select(col("ik"), col("s0").as("s"), (col("s0") + 5000).as("e"))
      val j = IntervalJoin.intervalJoin(p.toDF(), iv.toDF(), Seq("k"), Seq("ik"),
        "t", "s", "e")
      val initial = j.queryExecution.executedPlan.toString
      initial should include("IntervalJoin")
      initial should not include "BroadcastIntervalJoin"
      j.queryExecution.toRdd.count() should be > 0L
      val finalPlan = j.queryExecution.executedPlan.toString
      finalPlan.split("== Initial Plan ==").head should include("BroadcastIntervalJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  it("rejects ambiguous output column names") {
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.intervalJoin(points, points, Seq("k"), Seq("k"), "t", "t", "t")
  }

  it("reports honest statistics: linear in the inputs, not the child product") {
    // Catalyst's default for an unknown binary node is the PRODUCT of the
    // child sizes — the override estimates ~one match per point plus the
    // interval side, so downstream operators can still broadcast a small
    // interval-join result
    val j = IntervalJoin.intervalJoin(points, intervals,
      Seq("k"), Seq("i_key"), "t", "i_start", "i_end")
    val node = j.queryExecution.optimizedPlan.collectFirst {
      case p: IntervalJoinPlan => p }.get
    val ls = node.left.stats
    val rs = node.right.stats
    node.stats.sizeInBytes should be < ls.sizeInBytes * rs.sizeInBytes
    node.stats.sizeInBytes should be >= ls.sizeInBytes.max(rs.sizeInBytes)
  }

  it("reports a numOutputRows metric in both regimes") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val df = IntervalJoin.intervalJoin(points, intervals,
        Seq("k"), Seq("i_key"), "t", "i_start", "i_end", hint)
      df.collect()
      // PlanWalk unwraps AQE's stage wrappers, which plain TreeNode
      // traversal does not descend into
      val metrics = PlanWalk.unwrap(df.queryExecution.executedPlan).collectFirst {
        case e: IntervalJoinExec => e.metrics
        case e: BroadcastIntervalJoinExec => e.metrics
      }.get
      metrics("numOutputRows").value shouldBe 6L // the containment pairs
    }
  }
}
