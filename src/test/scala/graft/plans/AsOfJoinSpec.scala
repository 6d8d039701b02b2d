package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The native as-of join: semantics (backward/forward match, tolerance,
  * left outer, null handling, key-change reset) in BOTH physical regimes
  * (broadcast-right and sort-merge), agreement with the compositional
  * union-window operator on real data, and both plan shapes (SMJ: one
  * exchange + sort per side; broadcast: the fact side never shuffles or
  * sorts). */
class AsOfJoinSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 10.0),
    ("C", 99L, 7.0)).toDF("r_sym", "r_t", "px")

  private def trades = Seq(
    ("A", 5L), ("A", 20L), ("A", 25L), ("A", 31L),
    ("B", 14L), ("B", 16L),
    ("D", 50L)).toDF("sym", "t")

  // both physical regimes must agree on every semantic property: the hint
  // forces the regime regardless of the tiny test sizes
  private val regimes = Seq("broadcast" -> Some(true), "sort-merge" -> Some(false))

  it("matches each left row to the latest right row at or before it") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
          broadcastRight = hint)
        .select($"sym", $"t", $"r_t", $"px")
        .as[(String, Long, Option[Long], Option[Double])]
        .collect().sortBy(r => (r._1, r._2))
      out shouldBe Array(
        ("A", 5L, None, None), // before first quote
        ("A", 20L, Some(20L), Some(2.0)), // exact-time match counts
        ("A", 25L, Some(20L), Some(2.0)),
        ("A", 31L, Some(30L), Some(3.0)),
        ("B", 14L, None, None),
        ("B", 16L, Some(15L), Some(10.0)),
        ("D", 50L, None, None)) // key with no right rows
    }
  }

  it("matches forward: the earliest right row at or after each left row") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
          direction = "forward", broadcastRight = hint)
        .select($"sym", $"t", $"r_t", $"px")
        .as[(String, Long, Option[Long], Option[Double])]
        .collect().sortBy(r => (r._1, r._2))
      out shouldBe Array(
        ("A", 5L, Some(10L), Some(1.0)),
        ("A", 20L, Some(20L), Some(2.0)), // exact-time match counts
        ("A", 25L, Some(30L), Some(3.0)),
        ("A", 31L, None, None), // after the last quote
        ("B", 14L, Some(15L), Some(10.0)),
        ("B", 16L, None, None),
        ("D", 50L, None, None))
    }
  }

  it("bounds the match distance with tolerance, both directions") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val back = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
          tolerance = Some(4L), broadcastRight = hint)
        .select($"sym", $"t", $"r_t")
        .as[(String, Long, Option[Long])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      back(("A", 20L)) shouldBe Some(20L) // Δ0
      back(("A", 25L)) shouldBe None // Δ5 > 4 — backward match too stale
      back(("A", 31L)) shouldBe Some(30L) // Δ1
      back(("B", 16L)) shouldBe Some(15L) // Δ1
      val fwd = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
          direction = "forward", tolerance = Some(4L), broadcastRight = hint)
        .select($"sym", $"t", $"r_t")
        .as[(String, Long, Option[Long])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      fwd(("A", 5L)) shouldBe None // next quote at 10, Δ5 > 4
      fwd(("A", 25L)) shouldBe None // next at 30, Δ5 > 4
      fwd(("B", 14L)) shouldBe Some(15L) // Δ1
    }
  }

  it("tolerance never matches across a Long-overflow distance (sentinel times)") {
    // a Long.MinValue "beginning of time" sentinel quote: the true distance
    // to any real trade is ~2^63, but the naive subtraction wraps negative
    // and would pass d <= tol — both regimes must reject it
    val l = Seq(("A", 100L)).toDF("sym", "t")
    val r = Seq(("A", Long.MinValue, 1.0), ("B", 50L, 2.0))
      .toDF("r_sym", "r_t", "px")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(l, r, Seq("sym"), Seq("r_sym"), "t", "r_t",
          tolerance = Some(10L), broadcastRight = hint)
        .select($"px").collect()
      out.length shouldBe 1
      out.head.isNullAt(0) shouldBe true // sentinel is NOT within tolerance
    }
  }

  it("rejects same-name-different-case columns under case-insensitive resolution") {
    val l = Seq(("A", 10L)).toDF("sym", "Ts")
    val r = Seq(("A", 5L, 1.0)).toDF("r_sym", "ts", "px") // 'ts' vs 'Ts'
    val ex = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(l, r, Seq("sym"), Seq("r_sym"), "Ts", "ts")
    }
    ex.getMessage should include("ambiguous")
  }

  it("does not leak a match across a key change") {
    // C's quote at t=99 must never match B or D rows even though 99 > their times
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
          broadcastRight = hint)
        .where($"sym" =!= "A").select($"sym", $"px")
        .as[(String, Option[Double])].collect().toMap
      out("D") shouldBe None
    }
  }

  it("skips null-key and null-time rows instead of matching them") {
    val l = Seq((Some("A"), Some(10L)), (None, Some(10L)), (Some("A"), None))
      .toDF("sym", "t")
    val r = Seq((Some("A"), Some(5L), 1.0), (None, Some(1L), 99.0),
      (Some("A"), None, 98.0)).toDF("r_sym", "r_t", "px")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(l, r, Seq("sym"), Seq("r_sym"), "t", "r_t",
          broadcastRight = hint)
        .select($"sym", $"t", $"px").collect()
      out.length shouldBe 3 // left outer: every left row survives
      out.count(_.isNullAt(2)) shouldBe 2 // the null-key and null-time rows
      out.find(r => !r.isNullAt(0) && !r.isNullAt(1)).get.getDouble(2) shouldBe 1.0
    }
  }

  it("agrees with the compositional union-window as-of on real data") {
    val events = spark.read.parquet(s"${sf("sf0.001")}/events.parquet")
    val base = events.select($"event_id", $"user_id",
      col("ts").cast("timestamp").cast("long").as("t"), $"event_type", $"value")
    val l = base.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"t")
    val r = base.where($"event_type" === "click")
      .groupBy($"user_id".as("r_user"), $"t".as("r_t"))
      .agg(max($"value").as("click_value"))
    val composed = graft.operators.Temporal.asofJoin(
      l, r.withColumnRenamed("r_user", "user_id"),
      keyCols = Seq("user_id"), leftTs = "t", rightTs = "r_t",
      payloadCols = Seq("r_t", "click_value"))
      .select($"event_id", $"r_t", $"click_value")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val native = AsOf.asOfJoin(l, r, Seq("user_id"), Seq("r_user"), "t", "r_t",
          broadcastRight = hint)
        .select($"event_id", $"r_t", $"click_value")
      native.exceptAll(composed).count() shouldBe 0
      composed.exceptAll(native).count() shouldBe 0
    }
  }

  it("SMJ regime plans one exchange and one sort per side, nothing else") {
    val plan = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
        broadcastRight = Some(false))
      .queryExecution.executedPlan.toString
    plan should include("AsOfJoin")
    plan should not include "BroadcastAsOfJoin"
    "Exchange".r.findAllIn(plan).length shouldBe 2
    "(?i)\\bsort\\b".r.findAllIn(plan).length shouldBe 2
  }

  it("broadcast regime never shuffles or sorts the fact side") {
    val plan = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
        broadcastRight = Some(true))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastAsOfJoin")
    plan should include("BroadcastExchange")
    // the ONLY exchange is the broadcast one; nothing shuffles, nothing sorts
    "Exchange".r.findAllIn(plan).length shouldBe 1
    "(?i)\\bsort\\b".r.findAllIn(plan).length shouldBe 0
  }

  it("the size estimate picks broadcast for a tiny right side, SMJ past the threshold") {
    // tiny local relations sit far under the default 10MB threshold
    val auto = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
      .queryExecution.executedPlan.toString
    auto should include("BroadcastAsOfJoin")
    // same plan with broadcasting disabled must fall back to sort-merge
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
        .queryExecution.executedPlan.toString
      smj should include("AsOfJoin")
      smj should not include "BroadcastAsOfJoin"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  it("reuses a pre-partitioned left side: ZERO extra exchange on it") {
    // the SMJ exec's design case (AsOfJoin.scala requiredChildDistribution):
    // an upstream repartition/bucketed scan on the join key must satisfy
    // ClusteredDistribution, so EnsureRequirements adds no second shuffle
    // — the plan has exactly the user's exchange plus the right side's
    val plan = AsOf.asOfJoin(trades.repartition(3, $"sym"), quotes,
      Seq("sym"), Seq("r_sym"), "t", "r_t", broadcastRight = Some(false))
      .queryExecution.executedPlan.toString
    plan should include("AsOfJoin")
    "Exchange".r.findAllIn(plan).length shouldBe 2
  }

  it("a downstream per-key aggregate reuses the join's output partitioning") {
    // outputPartitioning = left.outputPartitioning: groupBy(sym) after the
    // join needs NO new exchange (2 total: one per join side) — the
    // cross-stage reuse the union+window composition cannot declare
    val agg = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
        broadcastRight = Some(false))
      .groupBy($"sym").agg(count(lit(1)).as("n"), max($"r_t").as("last_quote"))
    val plan = agg.queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length shouldBe 2
    agg.collect().length should be > 0
  }

  it("matches on multi-column keys in both regimes") {
    val l = Seq(("A", 1, 10L), ("A", 2, 10L), ("B", 1, 10L)).toDF("s", "v", "t")
    val r = Seq(("A", 1, 5L, 1.0), ("A", 2, 7L, 2.0), ("B", 2, 3L, 9.0))
      .toDF("rs", "rv", "rt", "px")
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(l, r, Seq("s", "v"), Seq("rs", "rv"), "t", "rt",
          broadcastRight = hint)
        .select($"s", $"v", $"px").as[(String, Int, Option[Double])]
        .collect().map(x => (x._1, x._2) -> x._3).toMap
      out(("A", 1)) shouldBe Some(1.0)
      out(("A", 2)) shouldBe Some(2.0)
      out(("B", 1)) shouldBe None // (B,2) must not leak to (B,1)
    }
  }

  it("null-extends every left row against an empty right side, both regimes") {
    val r = quotes.where($"px" < 0) // empty
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val out = AsOf.asOfJoin(trades, r, Seq("sym"), Seq("r_sym"), "t", "r_t",
          broadcastRight = hint)
      out.count() shouldBe 7
      out.where($"px".isNotNull).count() shouldBe 0
    }
  }

  it("AQE flips SMJ to broadcast at RUNTIME when the right side materializes small") {
    // the strategy reads right.stats, and AQE re-runs the planner with
    // LogicalQueryStage runtime statistics after each stage materializes —
    // so a post-aggregation right side whose STATIC estimate exceeds the
    // threshold (2M-row pre-agg scan) but whose RUNTIME size is tiny (200
    // groups) converts to BroadcastAsOfJoinExec mid-query, reusing the
    // left's already-materialized shuffle stage as the probe input. The
    // same runtime BHJ conversion Spark performs for its own joins, with
    // no hint and no code in the exec.
    import org.apache.spark.sql.functions.{col, max, rand}
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold between the static pre-agg estimate (~MBs) and the
      // materialized post-agg size (200 rows, a few KB)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val l = spark.range(200000).select((col("id") % 200).as("k"), col("id").as("t"))
      val rBig = spark.range(200000).select((col("id") % 200).as("rk"),
        (col("id") % 1000).as("rt0"), rand(7).as("v"))
      val r = rBig.groupBy(col("rk")).agg(max(col("rt0")).as("rt"))
      val j = AsOf.asOfJoin(l.toDF(), r.toDF(), Seq("k"), Seq("rk"), "t", "rt")
      val initial = j.queryExecution.executedPlan.toString
      initial should include("AsOfJoin")
      initial should not include "BroadcastAsOfJoin" // static stats: too big
      j.queryExecution.toRdd.count() shouldBe 200000L
      val finalPlan = j.queryExecution.executedPlan.toString
      finalPlan.split("== Initial Plan ==").head should include("BroadcastAsOfJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  it("rejects ambiguous output column names") {
    an[IllegalArgumentException] should be thrownBy
      AsOf.asOfJoin(trades, trades, Seq("sym"), Seq("sym"), "t", "t")
  }

  it("reports honest statistics: left cardinality at the widened width, not the child product") {
    // Catalyst's default for an unknown binary node is the PRODUCT of the
    // child sizes; the as-of join's cardinality is exact by construction
    // (one output row per left row), so the node overrides stats
    val j = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t")
    val node = j.queryExecution.optimizedPlan.collectFirst {
      case p: AsOfJoinPlan => p }.get
    val ls = node.left.stats
    val rs = node.right.stats
    node.stats.sizeInBytes should be < ls.sizeInBytes * rs.sizeInBytes
    node.stats.sizeInBytes should be >= ls.sizeInBytes // widened, never smaller
    node.stats.rowCount shouldBe ls.rowCount // exactly the left row count
  }

  it("an honest size estimate lets a DOWNSTREAM Spark join broadcast the as-of output") {
    // the scale case the stats override exists for: a dimension-sized
    // as-of result enriching a fact table through Spark's OWN join
    // planner. With the default product stats (~TB for two ~3MB inputs)
    // JoinSelection could never pick BHJ for this side; with the honest
    // estimate (~2x the left input) it statically plans BroadcastHashJoin.
    import org.apache.spark.sql.functions.col
    val dimL = spark.range(200000).select((col("id") % 500).as("k"), col("id").as("t"))
    val dimR = spark.range(200000).select((col("id") % 500).as("rk"),
      (col("id") / 500).cast("long").as("rt"), (col("id") % 97).as("px"))
    val asOfOut = AsOf.asOfJoin(dimL.toDF(), dimR.toDF(),
      Seq("k"), Seq("rk"), "t", "rt", broadcastRight = Some(false))
    val fact = spark.range(2000000).select((col("id") % 500).as("fk"), col("id").as("fv"))
    val plan = fact.join(asOfOut, col("fk") === col("k"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  it("reports numOutputRows and numMatchedRows metrics in both regimes") {
    for ((name, hint) <- regimes) withClue(s"regime=$name: ") {
      val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), Seq("r_sym"), "t", "r_t",
        broadcastRight = hint)
      df.collect()
      // PlanWalk unwraps AQE's stage wrappers, which plain TreeNode
      // traversal does not descend into
      val metrics = PlanWalk.unwrap(df.queryExecution.executedPlan).collectFirst {
        case e: AsOfJoinExec => e.metrics
        case e: BroadcastAsOfJoinExec => e.metrics
      }.get
      metrics("numOutputRows").value shouldBe 7L // one per left row
      metrics("numMatchedRows").value shouldBe 4L // the non-null-extended ones
    }
  }
}
