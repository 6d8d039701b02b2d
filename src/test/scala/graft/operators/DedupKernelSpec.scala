package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Round-14 gram/minhash kernel equivalence pins: the byte-range digest
  * bodies of [[Dedup.md5CharGramHashUdf]], [[Dedup.md5GramHashUdf]] and
  * [[Dedup.fusedMinHashUdf]] must be value-identical, row by row, to the
  * substring/StringBuilder bodies they replaced (kept as `...RefUdf` spec
  * twins) — including nulls, empty/whitespace-only texts, multi-byte and
  * supplementary codepoints, and UNPAIRED surrogates (where the whole-text
  * UTF-8 encode must count the same 1-byte '?' REPLACE the per-gram
  * substring encode produced). */
class DedupKernelSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val adversarialTexts: Seq[String] = Seq(
    null, "", "   ", "a", "one two three four five six",
    "repeated repeated repeated repeated",
    "café naïve ümlaut ß",
    "日本語のテキストをここに書く",
    "mixed 日本 ascii テキスト words",
    "emoji 😀 in 🎉 the 🚀 stream",
    "𐀀𐀁𐀂 supplementary run",
    "unpaired \uD800 high surrogate",
    "unpaired \uDC00 low surrogate",
    "pair split guard 😀😁 tail",
    "x" * 5000,
    ("word " * 300).trim)

  private val df = adversarialTexts.toDF("text")

  it("md5CharGramHashUdf (byte-range digests) equals the substring/TreeSet twin") {
    for (n <- Seq(1, 3, 7, 50)) {
      val both = df.select(
        Dedup.md5CharGramHashUdf(n)(col("text")).as("fused"),
        Dedup.md5CharGramHashRefUdf(n)(col("text")).as("ref"))
      both.collect().foreach { r => r.get(0) shouldBe r.get(1) }
    }
  }

  it("md5GramHashUdf (parts digests) equals the StringBuilder twin") {
    for (n <- Seq(1, 2, 5)) {
      val both = df.select(
        Dedup.md5GramHashUdf(n)(col("text")).as("fused"),
        Dedup.md5GramHashRefUdf(n)(col("text")).as("ref"))
      both.collect().foreach { r => r.get(0) shouldBe r.get(1) }
    }
  }

  it("fusedMinHashUdf (parts digests) equals the StringBuilder twin") {
    for ((sw, k) <- Seq((3, 64), (1, 8), (5, 16))) {
      val both = df.select(
        Dedup.fusedMinHashUdf(sw, k)(col("text")).as("fused"),
        Dedup.fusedMinHashRefUdf(sw, k)(col("text")).as("ref"))
      both.collect().foreach { r => r.get(0) shouldBe r.get(1) }
    }
  }

  it("modMersenne61 equals % over the affine domain including boundaries") {
    val p = Dedup.MinHashP
    val vs = Seq(0L, 1L, p - 1, p, p + 1, 2 * p - 1, 2 * p, 2 * p + 1,
      (1L << 62) - 1, (1L << 61), (1L << 61) - 2) ++
      (0 until 1000).map(i => (i.toLong * 0x9E3779B97F4A7C15L) >>> 2)
    vs.foreach { v => Dedup.modMersenne61(v) shouldBe (v % p) }
  }

  it("utf8CodepointOffsets spans concatenate to the whole encode") {
    for (t <- adversarialTexts.filter(_ != null)) {
      val (bytes, offs) = Dedup.utf8CodepointOffsets(t)
      offs.head shouldBe 0
      offs.last shouldBe bytes.length
      offs.sliding(2).foreach { case Array(a, b) => (b >= a) shouldBe true
                                case _ => () }
    }
  }
}
