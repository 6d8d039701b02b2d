package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

import java.sql.Timestamp

class TemporalSpec extends SparkTestBase with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  describe("asofJoin") {

    it("attaches the most recent right row at or before each left timestamp") {
      import spark.implicits._
      val trades = Seq(
        (1L, "A", ts("2024-01-01 10:00:05")),
        (2L, "A", ts("2024-01-01 10:00:20")),
        (3L, "B", ts("2024-01-01 10:00:10")),
        (4L, "B", ts("2024-01-01 09:00:00"))).toDF("trade_id", "sym", "t_ts")
      val quotes = Seq(
        ("A", ts("2024-01-01 10:00:00"), 100.0),
        ("A", ts("2024-01-01 10:00:10"), 101.0),
        ("B", ts("2024-01-01 10:00:10"), 50.0)).toDF("sym", "q_ts", "px")

      val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
        payloadCols = Seq("px"))
        .orderBy("trade_id")
        .select("trade_id", "px").as[(Long, Option[Double])].collect()

      out shouldBe Array(
        1L -> Some(100.0), // between the two A quotes -> earlier one
        2L -> Some(101.0), // after both -> latest
        3L -> Some(50.0),  // exactly at quote ts -> inclusive match
        4L -> None)        // before any B quote -> left-outer null
    }

    it("excludes equal timestamps in strict mode") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", ts("2024-01-01 10:00:10"), 7.0)).toDF("sym", "q_ts", "px")
      val inclusive = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head()
      val strict = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"),
        strict = true)
        .select("px").as[Option[Double]].head()
      inclusive shouldBe Some(7.0)
      strict shouldBe None
    }

    it("null right timestamps never match (ASOF semantics)") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", Option.empty[Timestamp], 7.0),
        ("A", Some(ts("2024-01-01 10:00:00")), 9.0)).toDF("sym", "q_ts", "px")
      Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head() shouldBe Some(9.0)
      // with ONLY a null-ts right row, the left row stays unmatched
      val rNull = Seq(("A", Option.empty[Timestamp], 7.0)).toDF("sym", "q_ts", "px")
      Temporal.asofJoin(l, rNull, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("px").as[Option[Double]].head() shouldBe None
    }

    it("null join keys never match on either side") {
      import spark.implicits._
      val l = Seq((1L, Option.empty[String], ts("2024-01-01 10:00:10")),
        (2L, Some("A"), ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq((Option.empty[String], ts("2024-01-01 10:00:00"), 7.0),
        (Some("A"), ts("2024-01-01 10:00:00"), 9.0)).toDF("sym", "q_ts", "px")
      val out = Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("px"))
        .select("id", "px").as[(Long, Option[Double])].collect().toMap
      out shouldBe Map(1L -> None, 2L -> Some(9.0)) // null key matches nothing
    }

    it("rejects payload columns that collide with left columns") {
      import spark.implicits._
      val l = Seq((1L, "A", ts("2024-01-01 10:00:10"))).toDF("id", "sym", "t_ts")
      val r = Seq(("A", ts("2024-01-01 10:00:00"), 7.0)).toDF("sym", "q_ts", "id")
      an[IllegalArgumentException] should be thrownBy
        Temporal.asofJoin(l, r, Seq("sym"), "t_ts", "q_ts", Seq("id"))
    }
  }

  describe("intervalJoin") {

    it("matches points to every containing half-open interval, across bucket boundaries") {
      import spark.implicits._
      val points = Seq(
        (1L, ts("2024-01-01 00:30:00")),
        (2L, ts("2024-01-02 12:00:00")),
        (3L, ts("2024-01-05 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(
        // 36h window spanning two day-buckets
        ("w1", ts("2024-01-01 00:00:00"), ts("2024-01-02 12:00:00")),
        ("w2", ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))).toDF("wid", "s", "e")

      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
        .select("pid", "wid").as[(Long, String)].collect().toSet

      // point 2 sits exactly on w1's exclusive end -> only w2; point 3 matches nothing
      out shouldBe Set(1L -> "w1", 2L -> "w2")
    }

    it("ignores inverted intervals instead of exploding the bucket range") {
      import spark.implicits._
      val points = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(
        ("bad", ts("2026-01-01 00:00:00"), ts("1970-01-01 00:00:00")),
        ("ok", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"))).toDF("wid", "s", "e")
      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
        .select("wid").as[String].collect().toSeq
      out shouldBe Seq("ok")
    }

    it("produces each matching pair exactly once even when an interval spans many buckets") {
      import spark.implicits._
      val points = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("pid", "p_ts")
      val intervals = Seq(("long", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")))
        .toDF("wid", "s", "e")
      val out = Temporal.intervalJoin(points, "p_ts", intervals, "s", "e")
      out.count() shouldBe 1L
    }
  }

  describe("cosineNearDupPairs") {
    it("finds exactly the blocked pairs above the rounded threshold") {
      import spark.implicits._
      val vecs = Seq(
        (1L, Array(1.0f, 0.0f), "x"),
        (2L, Array(0.9f, 0.1f), "x"),
        (3L, Array(-1.0f, 0.0f), "x"),
        (4L, Array(1.0f, 0.0f), "y")).toDF("id", "vec", "blk")
      val out = Similarity.cosineNearDupPairs(vecs, "id", "vec", col("blk"), 0.9)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // (1,2) similar same block; (1,4) identical but different blocks; (1,3) opposite
      out shouldBe Set(1L -> 2L)
    }
  }

  describe("randomProjection") {
    it("approximately preserves pairwise distance ordering (JL property)") {
      import spark.implicits._
      val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
        .filter(col("vec_id") < 200)
      val proj = Similarity.randomProjection(emb, "embedding", outDim = 16, dim = 64)
      proj.count() shouldBe 200
      // close pairs in the original space stay relatively close projected:
      // compare avg cosine of the top-10 original pairs vs 10 random pairs
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        blockCol = lit(1), threshold = -1.0)
        .orderBy(col("cos").desc).limit(10)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      val projPairs = Similarity.cosineNearDupPairs(
        proj.select(col("vec_id"), col("projected")), "vec_id", "projected",
        blockCol = lit(1), threshold = -1.0)
        .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val closeProjected = pairs.map(projPairs).sum / pairs.length
      val allAvg = projPairs.values.sum / projPairs.size
      closeProjected should be > allAvg // structure survives the projection
      // wrong declared dim fails loudly instead of projecting garbage
      an[Exception] should be thrownBy
        Similarity.randomProjection(emb, "embedding", outDim = 4, dim = 32)
          .select("projected").collect()
    }

    it("native matvec kernel is fold-order bit-identical to the HOF formulation (r14)") {
      import spark.implicits._
      val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
        .filter(col("vec_id") < 100)
      val planes = Similarity.hyperplanes(8, 64, 42L)
      val v = col("embedding").cast("array<double>")
      val twin = emb.withColumn("projected", array(planes.map(p =>
          round(Similarity.dot(array(p.toIndexedSeq.map(lit): _*), v), 6))
        .toIndexedSeq: _*))
        .select($"vec_id", $"projected").as[(Long, Seq[Double])]
        .collect().toMap
      val kernel = Similarity.randomProjection(emb, "embedding", outDim = 8, dim = 64)
        .select($"vec_id", $"projected").as[(Long, Seq[Double])]
        .collect().toMap
      kernel shouldBe twin // exact double equality: same fold order
    }
  }

  describe("semDedup") {
    it("keeps the earliest row of each within-cell duplicate group") {
      import spark.implicits._
      val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      val out = Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.3, nCells = 8, lloydIters = 2)
      out.count() shouldBe emb.count() // one verdict per input row
      val rows = out.as[(Long, Long, Option[Long], Boolean)].collect()
      // keep <=> no dup_of; dup_of always an earlier id
      rows.foreach { case (id, _, dupOf, keep) =>
        keep shouldBe dupOf.isEmpty
        dupOf.foreach(_ should be < id)
      }
      // every dup points at a KEPT-or-earlier row that exists
      val ids = rows.map(_._1).toSet
      rows.flatMap(_._3).foreach(ids should contain(_))
      // some dups found at this threshold on the test corpus
      rows.count(!_._4) should be > 0
      // deterministic under repartitioning
      val again = Similarity.semDedup(emb.repartition(13), "vec_id", "embedding",
        threshold = 0.3, nCells = 8, lloydIters = 2)
        .as[(Long, Long, Option[Long], Boolean)].collect().sortBy(_._1)
      again shouldBe rows.sortBy(_._1)
    }

    it("never compares across cells and dedups chains aggressively") {
      import spark.implicits._
      // two tight clusters far apart: with 2 cells each cluster is its own
      // cell; within a cluster all pairs are similar -> only the min id kept
      val vecs = Seq(
        (1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.02f)), (3L, Array(1.0f, 0.0f)),
        (10L, Array(-1.0f, 0.01f)), (11L, Array(-1.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, nCells = 2, lloydIters = 2)
        .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
      out shouldBe Map(1L -> true, 2L -> false, 3L -> false,
        10L -> true, 11L -> false)
    }
  }

  describe("marginMinePairs") {
    // independent replay of the margin arithmetic: rounded cosines as
    // integer micro-units, top-k by (cos DESC, id ASC), ratio margin
    def replay(xs: Seq[(Long, Array[Float])], ys: Seq[(Long, Array[Float])],
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
      def tops(byKey: Map[Long, Seq[(Long, Long)]]) = // key -> (best, bestCos, sum, n)
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

    it("matches an independent in-memory replay on real embeddings") {
      import spark.implicits._
      val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      val xs = emb.where($"vec_id" < 60)
      val ys = emb.where($"vec_id" >= 60 && $"vec_id" < 120)
      val got = Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
          k = 4, threshold = 1.0)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      def slurp(df: org.apache.spark.sql.DataFrame) =
        df.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
      val want = replay(slurp(xs), slurp(ys), k = 4, threshold = 1.0)
      got shouldBe want
      got should not be empty
      // deterministic under repartitioning
      val again = Similarity.marginMinePairs(xs.repartition(7), ys.repartition(3),
          "vec_id", "embedding", k = 4, threshold = 1.0)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      again shouldBe got
    }

    it("keeps only mutual best matches and computes the ratio margin exactly") {
      import spark.implicits._
      // y1's best is x1, so (x2, y1) must NOT survive even though y1 is
      // x2's best; the surviving pair's margin is hand-computable
      val xs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
      val ys = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
      val out = Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
          k = 2, threshold = 1.0)
        .as[(Long, Long, Double, Double)].collect().toSeq
      // den = 1e6/1 + (1e6 + 0.8e6)/2 = 1.9e6; margin = 2e6/1.9e6
      out shouldBe Seq((1L, 10L, 1.0, 1.052632))
    }

    it("celled variant at full probe reproduces the exact miner bit-for-bit") {
      import spark.implicits._
      val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
      val xs = emb.where($"vec_id" < 60)
      val ys = emb.where($"vec_id" >= 60 && $"vec_id" < 120)
      val exact = Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
          k = 4, threshold = 1.0)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      val celled = Similarity.marginMinePairsCelled(xs, ys, "vec_id", "embedding",
          k = 4, threshold = 1.0, nCells = 4, nProbe = 4)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      celled shouldBe exact
    }

    it("celled variant matches exact on clustered data with partial probes") {
      import spark.implicits._
      // two tight clusters; k=2 <= cluster size so every endpoint's true
      // top-k stays in-cluster and nProbe=1 finds the identical pairs
      def jig(base: Array[Float], e: Float) = base.zipWithIndex.map {
        case (v, i) => if (i == 1) v + e else v }
      val a = Array(1.0f, 0.0f, 0.0f)
      val b = Array(-1.0f, 0.0f, 0.3f)
      val xs = Seq((1L, jig(a, 0.01f)), (2L, jig(a, 0.03f)), (3L, jig(b, 0.02f)),
        (4L, jig(b, 0.05f))).toDF("vec_id", "embedding")
      val ys = Seq((10L, jig(a, 0.02f)), (11L, jig(a, 0.04f)), (12L, jig(b, 0.01f)),
        (13L, jig(b, 0.03f))).toDF("vec_id", "embedding")
      val exact = Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
          k = 2, threshold = 1.0)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      val celled = Similarity.marginMinePairsCelled(xs, ys, "vec_id", "embedding",
          k = 2, threshold = 1.0, nCells = 2, nProbe = 1)
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      exact should not be empty
      celled shouldBe exact
    }

    it("drops pairs whose combined neighbourhood sum is not positive") {
      import spark.implicits._
      val xs = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
      val ys = Seq((10L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
      Similarity.marginMinePairs(xs, ys, "vec_id", "embedding",
        k = 2, threshold = 0.0).count() shouldBe 0L
    }

    it("celled variant tolerates null vectors: they probe nothing, never NPE") {
      import spark.implicits._
      val xs = Seq((1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding")
      val ys = Seq((10L, Array(1.0f, 0.1f)), (11L, Array(0.9f, 0.0f)))
        .toDF("vec_id", "embedding")
      val out = Similarity.marginMinePairsCelled(xs, ys, "vec_id", "embedding",
          k = 2, threshold = 0.5, nCells = 1, nProbe = 1)
        .as[(Long, Long, Double, Double)].collect()
      out.map(_._1) should contain only 1L // the null x simply yields no pairs
    }
  }

  describe("funnel") {
    it("stages must occur strictly in order; repeats count once") {
      import spark.implicits._
      val ev = Seq(
        // user 1: full funnel in order
        (1L, ts("2024-01-01 10:00:00"), "signup"),
        (1L, ts("2024-01-01 11:00:00"), "click"),
        (1L, ts("2024-01-01 11:30:00"), "click"), // repeat: first one counts
        (1L, ts("2024-01-01 12:00:00"), "purchase"),
        // user 2: purchase BEFORE signup — never reaches stage 3
        (2L, ts("2024-01-01 09:00:00"), "purchase"),
        (2L, ts("2024-01-01 10:00:00"), "signup"),
        (2L, ts("2024-01-01 11:00:00"), "click"),
        // user 3: no signup at all — zero stages despite later events
        (3L, ts("2024-01-01 10:00:00"), "click"),
        (3L, ts("2024-01-01 11:00:00"), "purchase"))
        .toDF("user_id", "ts", "event_type")
      val out = Temporal.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
        .orderBy("user_id")
      val rows = out.collect()
      rows.map(_.getAs[Long]("stages_reached")).toSeq shouldBe Seq(3L, 2L, 0L)
      // the repeat click did not shift the recorded first-occurrence
      rows(0).getAs[Timestamp]("t_click") shouldBe ts("2024-01-01 11:00:00")
      // simultaneous events do not advance (strictly after)
      val tied = Seq((9L, ts("2024-01-01 10:00:00"), "signup"),
        (9L, ts("2024-01-01 10:00:00"), "click"))
        .toDF("user_id", "ts", "event_type")
      Temporal.funnel(tied, "user_id", "ts", "event_type", Seq("signup", "click"))
        .select("stages_reached").as[Long].head() shouldBe 1L
    }
  }

  describe("rollingZScore") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("k", "t", "v").select(col("k"), col("t").cast("timestamp").as("ts"), col("v"))

    it("flags a spike against its trailing window and guards cold starts") {
      val base = (0 until 10).map(i => (1L, f"2024-01-01 10:${i}%02d:00", 50.0 + i % 3))
      val spike = Seq((1L, "2024-01-01 10:10:30", 500.0))
      val out = Temporal.rollingZScore(mk(base ++ spike), Seq("k"), "ts", "v",
        windowSec = 3600, minPrior = 5, zThreshold = 3.0)
      val flagged = out.where(col("is_anomaly")).select("v").as[Double].collect()
      flagged shouldBe Array(500.0)
      // the first rows (fewer than minPrior prior points) are never flagged,
      // even though the early variance is tiny
      out.where(col("n_prior") < 5 && col("is_anomaly")).count() shouldBe 0L
    }

    it("handles constant windows (zero variance) and null values") {
      val const = (0 until 8).map(i => (1L, f"2024-01-01 10:0$i:00", 7.0))
      val out = Temporal.rollingZScore(mk(const), Seq("k"), "ts", "v",
        windowSec = 3600, minPrior = 3, zThreshold = 3.0)
      // std = 0 -> z undefined -> never anomalous (no division blowup)
      out.where(col("is_anomaly")).count() shouldBe 0L
      out.where(col("z").isNotNull).count() shouldBe 0L
      // a null value contributes nothing and is not flagged
      val withNull = mk(const).unionByName(
        Seq((1L, "2024-01-01 10:08:00")).toDF("k", "t")
          .select(col("k"), col("t").cast("timestamp").as("ts"),
            lit(null).cast("double").as("v")))
      val nr = Temporal.rollingZScore(withNull, Seq("k"), "ts", "v",
        windowSec = 3600, minPrior = 3, zThreshold = 3.0)
      nr.count() shouldBe 9L
      nr.where(col("v").isNull).select("n_prior").as[Long].head() shouldBe 8L
    }

    it("windows are per key and time-bounded") {
      val rows = (0 until 6).map(i => (1L, f"2024-01-01 10:0$i:00", 10.0)) ++
        Seq((2L, "2024-01-01 10:06:00", 99999.0)) ++ // other key: own window
        Seq((1L, "2024-01-01 13:00:00", 10.0)) // 3h later: empty 1h window
      val out = Temporal.rollingZScore(mk(rows), Seq("k"), "ts", "v",
        windowSec = 3600, minPrior = 2, zThreshold = 3.0)
      out.where(col("k") === 2).select("n_prior").as[Long].head() shouldBe 0L
      out.where(col("k") === 1 && col("ts") === lit("2024-01-01 13:00:00").cast("timestamp"))
        .select("n_prior").as[Long].head() shouldBe 0L
      out.where(col("is_anomaly")).count() shouldBe 0L
    }
  }

  describe("resampleLocf") {
    import spark.implicits._

    it("emits epoch-aligned ticks carrying the latest observation at or before each") {
      val obs = Seq(
        (1L, ts("2024-01-01 10:30:00"), 10.0), // span 01-01 .. 01-04
        (1L, ts("2024-01-02 23:59:00"), 20.0),
        (1L, ts("2024-01-04 00:00:00"), 30.0),
        (2L, ts("2024-01-02 12:00:00"), 99.0)  // span < one day: no tick? no —
        // 2024-01-03 00:00 > max, so key 2 emits nothing
      ).toDF("user_id", "ts", "v")
      val out = Temporal.resampleLocf(obs, Seq("user_id"), "ts", "v",
          intervalSec = 86400)
        .select(col("user_id"), col("tick").cast("string"), col("v"))
        .as[(Long, String, Double)].collect().toSet
      out shouldBe Set(
        (1L, "2024-01-02 00:00:00", 10.0), // first aligned tick after 10:30
        (1L, "2024-01-03 00:00:00", 20.0),
        (1L, "2024-01-04 00:00:00", 30.0)) // tick == obs ts: inclusive match
    }

    it("a tick aligned exactly on the first observation starts the grid") {
      val obs = Seq((1L, ts("2024-01-02 00:00:00"), 5.0),
        (1L, ts("2024-01-03 06:00:00"), 7.0)).toDF("user_id", "ts", "v")
      val out = Temporal.resampleLocf(obs, Seq("user_id"), "ts", "v", 86400)
        .select(col("tick").cast("string"), col("v"))
        .as[(String, Double)].collect().toSet
      out shouldBe Set(("2024-01-02 00:00:00", 5.0), ("2024-01-03 00:00:00", 5.0))
    }

    it("matches a window-composed LOCF on random event sets") {
      val rnd = new scala.util.Random(7)
      val obs = (1 to 500).map { _ =>
        (rnd.nextInt(5).toLong,
          ts(f"2024-01-${1 + rnd.nextInt(20)}%02d ${rnd.nextInt(24)}%02d:00:00"),
          rnd.nextInt(1000).toDouble)
      }.distinct.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (key, ts)
        .toDF("user_id", "ts", "v")
      val native = Temporal.resampleLocf(obs, Seq("user_id"), "ts", "v", 86400)
        .select(col("user_id"), col("tick"), col("v"))
      // oracle: compositional asofJoin over the same grid (same key name
      // on both sides, per asofJoin's contract)
      val grid = native.select(col("user_id"), col("tick")).distinct()
        .withColumnRenamed("user_id", "u")
      val composed = Temporal.asofJoin(grid,
          obs.withColumnRenamed("user_id", "u"),
          keyCols = Seq("u"), leftTs = "tick", rightTs = "ts",
          payloadCols = Seq("v"))
      // align for comparison
      val a = native.as[(Long, Timestamp, Double)].collect().toSet
      val b = composed.select(col("u"), col("tick"), col("v"))
        .as[(Long, Timestamp, Double)].collect().toSet
      a shouldBe b
    }
  }
}
