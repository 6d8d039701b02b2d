package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Winnowing fingerprints: the native expression's selection semantics and
  * the MOSS coverage guarantee (any shared substring of length >= k+w-1
  * yields a common fingerprint hash). */
class WinnowSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def fp(text: String, k: Int, w: Int): Seq[(Long, Long)] =
    Dedup.winnowFingerprints(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", k, w)
      .select($"pos", $"fp_hash").as[(Long, Long)].collect().toSeq.sortBy(_._1)

  it("text shorter than k yields no fingerprints") {
    fp("abc", 8, 4) shouldBe empty
  }

  it("k <= length < k+w-1 selects from the single whole-range window") {
    val sel = fp("abcdefgh", 4, 16) // m = 5 hashes, one window
    sel should have size 1
  }

  it("positions are strictly increasing, 1-based, within the hash range") {
    val text = "the quick brown fox jumps over the lazy dog and runs on"
    val sel = fp(text, 8, 4)
    sel should not be empty
    sel.map(_._1) shouldBe sel.map(_._1).sorted
    sel.map(_._1).distinct should have size sel.size.toLong
    all(sel.map(_._1)) should be >= 1L
    all(sel.map(_._1)) should be <= (text.length - 8 + 1).toLong
  }

  it("every w-window of hashes contains a selected position (winnowing density)") {
    val text = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopqrstuvwxyz"
    val k = 4; val w = 5
    val m = text.length - k + 1
    val sel = fp(text, k, w).map(_._1.toInt).toSet
    // MOSS guarantee: each window [i, i+w-1] of hash positions has >= 1 pick
    (1 to (m - w + 1)).foreach { i =>
      (i until i + w).exists(sel.contains) shouldBe true
    }
  }

  it("a shared >= k+w-1 substring produces a common fingerprint hash") {
    val shared = "zqxjvkwpfbzqxjvkwpfbzqxjvkwpfb1" // 31 chars = k+w-1 for 16/16
    val a = "prefix aaaa " + shared + " suffix bbbb"
    val b = "totally different lead-in " + shared + " other tail"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val hashes = Dedup.winnowFingerprints(docs, "doc_id", "text", 16, 16)
      .select($"doc_id", $"fp_hash").as[(Long, Long)].collect()
    val ha = hashes.filter(_._1 == 1L).map(_._2).toSet
    val hb = hashes.filter(_._1 == 2L).map(_._2).toSet
    ha.intersect(hb) should not be empty
  }

  it("rightmost-min tie-break: a run of one repeated char picks the window tail") {
    // all k-gram hashes equal -> every window's rightmost position wins
    val sel = fp("aaaaaaaaaaaa", 4, 3) // m = 9
    // windows [1..3],[2..4],...,[7..9] pick 3,4,...,9
    sel.map(_._1) shouldBe (3L to 9L)
    sel.map(_._2).distinct should have size 1
  }

  describe("shingleNovelty") {
    it("first occurrence scores 1.0, an exact later copy scores 0.0") {
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta"), // copy of 1
        (3L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
      val nov = Dedup.shingleNovelty(docs, "doc_id", "text", n = 3)
        .select($"doc_id", $"novelty").as[(Long, Double)].collect().toMap
      nov(1L) shouldBe 1.0
      nov(2L) shouldBe 0.0
      nov(3L) shouldBe 1.0
    }

    it("partial overlap lands strictly between 0 and 1") {
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta fresh words here now")).toDF("doc_id", "text")
      val nov = Dedup.shingleNovelty(docs, "doc_id", "text", n = 3)
        .select($"doc_id", $"novelty").as[(Long, Double)].collect().toMap
      nov(2L) should (be > 0.0 and be < 1.0)
    }
  }
}
