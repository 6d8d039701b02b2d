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

  describe("heavyHitters (two-pass sketch + exact verify)") {
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
}
