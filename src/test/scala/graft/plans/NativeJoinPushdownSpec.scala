package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The pushdown rule for the native join nodes: single-side deterministic
  * conjuncts sink below the node (and reach the parquet scan as
  * PushedFilters), everything else stays above, results are unchanged. */
class NativeJoinPushdownSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 15L, 3.0))
    .toDF("r_sym", "r_t", "px")
  private def trades = Seq(("A", 5L, 1), ("A", 25L, 2), ("B", 16L, 1))
    .toDF("sym", "t", "qty")

  it("sinks a left-only filter below the as-of join") {
    val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .where($"qty" === 1)
    val opt = df.queryExecution.optimizedPlan
    // no Filter above the join anymore...
    opt.collectFirst { case f @ Filter(_, _: AsOfJoinPlan) => f } shouldBe empty
    // ...because it moved into the left child
    val j = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    j.left.collectFirst { case f: Filter => f } should not be empty
    df.select($"sym", $"t", $"px").as[(String, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)) shouldBe Array(
      ("A", 5L, None), ("B", 16L, Some(3.0)))
  }

  it("keeps right-side and cross-side conjuncts above an as-of join") {
    // right-only predicates must NOT commute with a LEFT OUTER as-of:
    // they act on the matched values (null-extended rows included)
    val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .where($"px" > 1.0 && $"qty" < $"px")
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    j.left.collectFirst { case f: Filter => f } shouldBe empty
    j.right.collectFirst { case f: Filter => f } shouldBe empty
    opt.collectFirst { case f @ Filter(_, _: AsOfJoinPlan) => f } should not be empty
  }

  it("splits a conjunction: pushable left part sinks, the rest stays") {
    val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .where($"qty" === 1 && $"px" > 2.0)
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    j.left.collectFirst { case f: Filter => f } should not be empty
    opt.collectFirst { case f @ Filter(_, _: AsOfJoinPlan) => f } should not be empty
    df.select($"sym").as[String].collect() shouldBe Array("B")
  }

  it("does not move non-deterministic predicates") {
    val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .where(rand(7) >= 0.0 && $"qty" === 1)
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    // the deterministic qty conjunct may sink; rand() must not
    j.left.collect { case f: Filter => f }
      .flatMap(_.condition.collect { case e if !e.deterministic => e }) shouldBe empty
    df.count() shouldBe 2
  }

  it("pushes each side's conjunct to its child of an interval join") {
    val iv = Seq(("A", 0L, 30L, 1.0), ("B", 0L, 30L, 2.0))
      .toDF("i_key", "i_start", "i_end", "w")
    val df = IntervalJoin.intervalJoin(trades, iv, Seq("sym"), Seq("i_key"),
      "t", "i_start", "i_end")
      .where($"qty" === 1 && $"w" < 2.0)
    val opt = df.queryExecution.optimizedPlan
    opt.collectFirst { case f @ Filter(_, _: IntervalJoinPlan) => f } shouldBe empty
    val j = opt.collectFirst { case j: IntervalJoinPlan => j }.get
    j.left.collectFirst { case f: Filter => f } should not be empty
    j.right.collectFirst { case f: Filter => f } should not be empty
    df.select($"sym", $"t").as[(String, Long)].collect() shouldBe Array(("A", 5L))
  }

  it("prunes unreferenced child columns below the native joins") {
    val wideQuotes = quotes.withColumn("venue", lit("X")).withColumn("lot", lit(100))
    val df = AsOf.asOfJoin(trades, wideQuotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .select($"sym", $"t", $"px") // venue/lot unused
    val opt = df.queryExecution.optimizedPlan
    val j = opt.collectFirst { case j: AsOfJoinPlan => j }.get
    j.right.output.map(_.name).toSet shouldBe Set("r_sym", "r_t", "px")
    df.as[(String, Long, Option[Double])].collect()
      .sortBy(r => (r._1, r._2)) shouldBe Array(
      ("A", 5L, None), ("A", 25L, Some(2.0)), ("B", 16L, Some(3.0)))
  }

  it("narrows the parquet ReadSchema through the as-of join") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val left = events.withColumn("t", col("ts").cast("timestamp").cast("long"))
    val right = events
      .select($"user_id".as("r_user"), col("ts").cast("timestamp").cast("long").as("r_t"),
        $"value".as("r_value"), $"props".as("r_props"))
    val planStr = AsOf.asOfJoin(
        left.select($"event_id", $"user_id", $"t"), right,
        Seq("user_id"), Seq("r_user"), "t", "r_t")
      .select($"event_id", $"r_t") // r_value / r_props unused
      .queryExecution.executedPlan.toString
    // the right side's scan must not read the dropped payload columns
    val rightScan = planStr.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("props")).toSeq
    rightScan shouldBe empty
  }

  it("carries a pushed filter all the way into the parquet scan") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
      .select($"event_id", $"user_id", col("ts").cast("timestamp").cast("long").as("t"),
        $"event_type")
    val r = events.select($"user_id".as("r_user"), $"t".as("r_t")).distinct()
    val joinedPlan = AsOf.asOfJoin(events, r, Seq("user_id"), Seq("r_user"), "t", "r_t")
      .where($"event_type" === "purchase")
      .queryExecution.executedPlan.toString
    // the predicate reaches the left side's file scan as a pushed filter —
    // at 100 TB this prunes row groups before the shuffle, not after it
    joinedPlan should include regex "PushedFilters: \\[[^\\]]*EqualTo\\(event_type,purchase\\)"
  }
}
