package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class GopherFilterSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def metric(text: String)(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double =
    Seq(text).toDF("t").select(c(col("t")).cast("double").as("m")).as[Double].head()

  describe("gopher signals") {

    it("symbolToWordRatio counts #, ... and the one-char ellipsis") {
      // 7 whitespace tokens (symbol runs are tokens too); 3 symbol matches —
      // "...." matches "..." once, leftmost-greedy
      metric("one # two … three .... four")(TextFunctions.symbolToWordRatio(_)) shouldBe
        (3.0 / 7.0 +- 1e-6)
    }

    it("bulletLineFrac and ellipsisLineFrac work per line") {
      val t = "- first\n  * second\nplain line\nends here...\n• last"
      metric(t)(TextFunctions.bulletLineFrac(_)) shouldBe (3.0 / 5.0 +- 1e-6)
      metric(t)(TextFunctions.ellipsisLineFrac(_)) shouldBe (1.0 / 5.0 +- 1e-6)
    }

    it("alphaWordFrac separates words from numbers/symbols") {
      metric("abc 123 a1 ### x")(TextFunctions.alphaWordFrac(_)) shouldBe (3.0 / 5.0 +- 1e-6)
    }

    it("stopwordPresence counts distinct stop words, not occurrences") {
      metric("the the the the")(TextFunctions.stopwordPresence(_)) shouldBe 1L
      metric("the cat and the dog have fun with that")(
        TextFunctions.stopwordPresence(_)) shouldBe 5L // the, and, that, have, with
    }

    it("gopherPass accepts natural prose and rejects degenerate docs") {
      val good = ("The quick brown fox jumps over the lazy dog and runs to " +
        "the river of dreams that we have seen with our own eyes. ") * 5
      val tooShort = "The cat sat."
      val symbols = "# # # # # ... ... ... # # # ... word the of and to be " * 10
      val df = Seq(good, tooShort, symbols).toDF("t")
        .select(TextFunctions.gopherPass(col("t")).as("p"))
        .as[Boolean].collect()
      df shouldBe Array(true, false, false)
    }

    it("handles empty text without errors") {
      metric("")(TextFunctions.symbolToWordRatio(_)) shouldBe 0.0
      metric("")(TextFunctions.alphaWordFrac(_)) shouldBe 0.0
      metric("")(TextFunctions.stopwordPresence(_)) shouldBe 0L
      Seq("").toDF("t").select(TextFunctions.gopherPass(col("t")).as("p"))
        .as[Boolean].head() shouldBe false
    }
  }
}
