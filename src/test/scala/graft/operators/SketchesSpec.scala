package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val items = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("item")

  it("sketch cells sum to the item total in every row; estimates are one-sided") {
    val sketch = Sketches.countMinSketch(items, "item", depth = 3, width = 4)
    // every depth row partitions the 9 items across its buckets
    sketch.groupBy("cm_depth").agg(sum("cm_count").as("s"))
      .select("s").as[Long].collect().toSeq shouldBe Seq(9L, 9L, 9L)
    val exact = items.groupBy($"item").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(exact, "item", sketch, depth = 3, width = 4)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    est.foreach { case (_, ex, e) =>
      e should be >= ex // the count-min guarantee
      e should be <= 9L // never above the stream total
    }
  }

  it("a wide sketch resolves to exact counts; estimation order is stable") {
    val sketch = Sketches.countMinSketch(items, "item", depth = 4, width = 512)
    val exact = items.groupBy($"item").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(exact, "item", sketch, depth = 4, width = 512)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // 3 items in 4x512 cells: no full-depth collision — estimates exact
    est shouldBe Seq(("a", 5L, 5L), ("b", 3L, 3L), ("c", 1L, 1L))
  }

  it("merging per-partition sketches equals the whole-corpus sketch (linearity)") {
    val left = items.limit(4)
    val right = items.exceptAll(left)
    val merged = Sketches.mergeSketches(
      Sketches.countMinSketch(left, "item", depth = 3, width = 4),
      Sketches.countMinSketch(right, "item", depth = 3, width = 4))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val whole = Sketches.countMinSketch(items, "item", depth = 3, width = 4)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    merged shouldBe whole
  }

  it("querying an item never inserted estimates from collision mass only") {
    val sketch = Sketches.countMinSketch(items, "item", depth = 4, width = 512)
    val unseen = Seq("zzz").toDF("item")
    val est = Sketches.countMinEstimate(unseen, "item", sketch, depth = 4, width = 512)
      .select("cm_estimate").as[Long].head()
    est shouldBe 0L // wide sketch: all 4 of zzz's cells empty
  }

  it("weighted construction over the frequency frame equals the instance-stream sketch") {
    val freq = items.groupBy($"item").agg(count(lit(1)).cast("long").as("w"))
    val weighted = Sketches.countMinSketchWeighted(freq, "item", "w", depth = 3, width = 4)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val stream = Sketches.countMinSketch(items, "item", depth = 3, width = 4)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    weighted shouldBe stream // linearity: same cells, bit-for-bit
  }

  describe("heavyHitters (single corpus pass: count once, sketch + confirm from the counts)") {
    // 50 distinct light items + 2 heavy ones, narrow sketch => collisions
    val stream = (
      (1 to 50).flatMap(i => Seq.fill(2)(s"light_$i")) ++
        Seq.fill(40)("hot_a") ++ Seq.fill(25)("hot_b")).toDF("item")

    it("finds every truly heavy item, confirmed, with exact counts") {
      val hh = Sketches.heavyHitters(stream, "item", threshold = 20, depth = 4, width = 8)
        .as[(String, Long, Long, Boolean)].collect().toSeq
      val confirmed = hh.filter(_._4).map(r => r._1 -> r._3).toMap
      confirmed should contain allOf ("hot_a" -> 40L, "hot_b" -> 25L)
      // one-sidedness: no truly-heavy item can be missing from the candidates
      hh.map(_._1) should contain allOf ("hot_a", "hot_b")
    }

    it("estimates dominate exact counts; false candidates carry confirmed=false") {
      // width 2: every cell holds ~half the stream mass, so every light item
      // becomes a candidate — and the exact pass must reject them all
      val hh = Sketches.heavyHitters(stream, "item", threshold = 20, depth = 4, width = 2)
        .as[(String, Long, Long, Boolean)].collect().toSeq
      hh.foreach { case (_, est, exact, conf) =>
        est should be >= exact // count-min guarantee per candidate
        conf shouldBe (exact >= 20)
      }
      hh.exists(!_._4) shouldBe true // false positives exist...
      hh.filter(_._4).map(_._1).toSet shouldBe Set("hot_a", "hot_b") // ...and are rejected
    }
  }

  describe("XxHash family (native production hash, no oracle replay)") {
    it("keeps the one-sided guarantee and finds the planted heavy hitters") {
      val items = (Seq.fill(40)("hot_a") ++ Seq.fill(25)("hot_b") ++
        (1 to 200).map(i => s"cold_$i")).toDF("item")
      val hh = Sketches.heavyHitters(items, "item", threshold = 20,
          depth = 4, width = 64, family = Sketches.XxHash)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3)))
      // candidates are a superset of the true heavy set; estimates never
      // undercount
      hh.filter(_._4).map(_._1).toSet shouldBe Set("hot_a", "hot_b")
      hh.foreach { case (_, est, exact, _) => est should be >= exact }
    }

    it("estimates every item one-sidedly and the families agree on exact-width sketches") {
      val items = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("item")
      val truth = Map("a" -> 7L, "b" -> 3L, "c" -> 1L)
      Seq(Sketches.Md5Hash, Sketches.XxHash).foreach { fam =>
        val sk = Sketches.countMinSketch(items, "item", depth = 3,
          width = 1024, family = fam)
        val est = Sketches.countMinEstimate(items.distinct(), "item", sk,
            depth = 3, width = 1024, family = fam)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        withClue(s"family=$fam: ") {
          truth.foreach { case (k, v) => est(k) should be >= v }
          // 3 items in 1024 buckets: collisions are practically absent, so
          // both families should be exact here
          est shouldBe truth
        }
      }
    }
  }

  describe("cmJoinSizeEstimate (sketch inner product)") {
    val a = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val b = (Seq.fill(2)("a") ++ Seq.fill(5)("c") ++ Seq("d")).toDF("k")
    // exact |A ⋈ B| = 3·2 (a) + 1·5 (c) = 11

    it("recovers the exact join size when buckets don't collide") {
      val est = Sketches.cmJoinSizeEstimate(
        Sketches.countMinSketch(a, "k", depth = 3, width = 64),
        Sketches.countMinSketch(b, "k", depth = 3, width = 64))
        .as[Long].head()
      est shouldBe 11L
    }

    it("stays one-sided under forced collisions") {
      val est = Sketches.cmJoinSizeEstimate(
        Sketches.countMinSketch(a, "k", depth = 2, width = 2),
        Sketches.countMinSketch(b, "k", depth = 2, width = 2))
        .as[Long].head()
      est should be >= 11L
    }

    it("a known depth uses a literal spine and agrees with the recovered one") {
      val sa = Sketches.countMinSketch(a, "k", depth = 3, width = 64)
      val sb = Sketches.countMinSketch(b, "k", depth = 3, width = 64)
      Sketches.cmJoinSizeEstimate(sa, sb, depth = Some(3))
        .as[Long].head() shouldBe 11L
      // disjoint keys: every depth has zero overlapping cells -> 0, not NULL
      val sd = Sketches.countMinSketch(Seq("x", "y").toDF("k"), "k",
        depth = 3, width = 64)
      Sketches.cmJoinSizeEstimate(sa, sd, depth = Some(3))
        .as[Long].head() shouldBe 0L
    }
  }

  describe("kmvSketch (bounded distinct sketch with set ops)") {
    it("the XxHash family is exact below k and estimates within rsd above it") {
      val exact = (1 to 5).flatMap(v => Seq.fill(3)(v.toLong)).toDF("v")
      val sk = Sketches.kmvSketch(exact, Seq(lit(1).as("g")), $"v", k = 8,
        family = Sketches.XxHash)
      sk.select(org.apache.spark.sql.functions.size($"kmv"))
        .as[Int].head() shouldBe 5
      val big = (1 to 2000).map(_.toLong).toDF("v")
      val est = Sketches.kmvSketch(big, Seq(lit(1).as("g")), $"v", k = 256,
          family = Sketches.XxHash)
        .select(Sketches.kmvEstimate($"kmv", 256)).as[Double].head()
      est shouldBe 2000.0 +- 400.0 // ~1/sqrt(k) rsd
    }

    it("is exact below k and deduplicates repeats") {
      val df = (1 to 5).flatMap(v => Seq.fill(10)(v.toLong)).toDF("v")
      val sk = Sketches.kmvSketch(df, Seq(lit(1).as("g")), $"v", k = 8)
      val out = sk.select(org.apache.spark.sql.functions.size($"kmv").as("n"),
        Sketches.kmvEstimate($"kmv", 8).as("est")).as[(Int, Double)].head()
      out shouldBe ((5, 5.0))
    }

    it("estimates large cardinalities within sketch error") {
      val df = (1L to 2000L).toDF("v")
      val sk = Sketches.kmvSketch(df, Seq(lit(1).as("g")), $"v", k = 128)
      val est = sk.select(Sketches.kmvEstimate($"kmv", 128)).as[Double].head()
      est should be > 1500.0
      est should be < 2500.0 // ~1/sqrt(k) ≈ 9% relative error at k=128
    }

    it("merges losslessly: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
      val a = (1L to 700L).toDF("v").withColumn("g", lit("a"))
      val b = (500L to 1200L).toDF("v").withColumn("g", lit("b"))
      val parts = Sketches.kmvSketch(a.union(b), Seq($"g"), $"v", k = 64)
      val merged = parts.groupBy().agg(collect_list($"kmv").as("ks"))
        .select(Sketches.kmvMerge(element_at($"ks", 1), element_at($"ks", 2), 64)
          .as("kmv"))
      val whole = Sketches.kmvSketch(
        a.union(b).select($"v").distinct(), Seq(lit(1).as("g")), $"v", k = 64)
      merged.select($"kmv").as[Seq[Long]].head() shouldBe
        whole.select($"kmv").as[Seq[Long]].head()
    }

    it("estimates overlap of two half-overlapping sets") {
      val df = ((1L to 1000L).map(v => (v, "a")) ++
        (501L to 1500L).map(v => (v, "b"))).toDF("v", "g")
      val sk = Sketches.kmvSketch(df, Seq($"g"), $"v", k = 256)
      val wide = sk.groupBy().pivot("g").agg(first($"kmv"))
      val est = wide.select(
        Sketches.kmvIntersectEstimate($"a", $"b", 256).as("inter"),
        Sketches.kmvEstimate(Sketches.kmvMerge($"a", $"b", 256), 256).as("uni"))
        .as[(Double, Double)].head()
      est._1 should be > 300.0 // truth 500
      est._1 should be < 700.0
      est._2 should be > 1200.0 // truth 1500
      est._2 should be < 1800.0
    }
  }
}
