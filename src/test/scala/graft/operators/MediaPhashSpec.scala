package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class MediaPhashSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def hashOf(payloads: (Long, String)*): Map[Long, Long] =
    Multimodal.perceptualHashes(
      payloads.toSeq.toDF("doc_id", "text")
        .select($"doc_id", encode($"text", "utf-8").as("content")),
      "doc_id", "content")
      .as[(Long, Long)].collect().toMap

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val base =
    "the quick brown fox jumps over the lazy dog while the engine shuffles " +
      "partitions and prunes columns across a very large corpus of documents"

  it("is locality-sensitive: identical = 0 bits, small edit = few bits, unrelated = many") {
    val h = hashOf(
      1L -> base,
      2L -> base,
      3L -> (base.substring(0, 40) + "zzzz" + base.substring(44)), // in-place edit
      4L -> "completely unrelated text about storage formats and audit tables and nothing else at all in common here")
    hamming(h(1L), h(2L)) shouldBe 0
    hamming(h(1L), h(3L)) should be <= 6
    hamming(h(1L), h(4L)) should be > 3
  }

  it("empty and null payloads hash to zero") {
    val h = hashOf(1L -> "")
    h(1L) shouldBe 0L
    val withNull = Seq((2L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "content")
    Multimodal.perceptualHashes(withNull, "doc_id", "content")
      .as[(Long, Long)].collect().toMap.apply(2L) shouldBe 0L
  }

  it("uses only 60 bits (positive BIGINT range for SQL oracles)") {
    val h = hashOf(1L -> base, 2L -> (base * 3))
    h.values.foreach { v =>
      v should be >= 0L
      (v >>> 60) shouldBe 0L
    }
  }

  it("fingerprintPairs over phash matches brute force at hamming<=3 and never goes all-pairs") {
    val docs = (0L until 30L).map { i =>
      val t = s"document number $i with some shared boilerplate text " + base
      (i, t)
    } ++ Seq((100L, base), (101L, base.substring(0, 40) + "xxxx" + base.substring(44)))
    val media = docs.toDF("doc_id", "text")
      .select($"doc_id", encode($"text", "utf-8").as("content"))
    val hashed = Multimodal.perceptualHashes(media, "doc_id", "content")
      .select($"doc_id", $"phash".as("sh"))
    val pairs = Dedup.fingerprintPairs(hashed, maxHamming = 3)
    // plan shape: blocked equi-join on (quad, qval), never a cartesian
    pairs.queryExecution.executedPlan.toString should not include "Cartesian"

    val got = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hs = hashed.as[(Long, Long)].collect()
    val want = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && hamming(ha, hb) <= 3
    } yield (ia, ib)).toSet
    got shouldBe want
    got should contain((100L, 101L))
  }
}
