package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class GopherFilterSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def metric(text: String)(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double =
    Seq(text).toDF("t").select(c(col("t")).cast("double").as("m")).as[Double].head()

  describe("fused word-set counting (graft_word_sets_count, r13)") {
    // the raw regex the fused counter replaces — counted side by side on
    // the same rows, adversarial shapes included
    def regexCount(t: org.apache.spark.sql.Column, words: Seq[String]) =
      org.apache.spark.sql.functions.size(regexp_extract_all(lower(t),
        lit(words.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")),
        lit(0))).cast("long")

    it("matches the \\b-alternation regex count on adversarial text shapes") {
      val words = Seq("the", "de", "a", "es", "x2", "under_score")
      val rows = Seq(
        "the quick the lazy the",          // plain repeats
        "the-of-the and.the,the!the",      // punctuation-joined runs
        "dent theory esoteric",            // words as PREFIXES of runs (no match)
        "de-n de2 de_ de",                 // suffix word-chars kill the boundary
        "THE The tHe",                     // lower() folding
        "café theé éthe the",  // Java \\b is UNICODE-aware: theé = ONE word
        "x2 2x x22 _x2_ under_score",      // digits + underscores as word chars
        "a a a a a",                       // single-char word runs
        "文本 the 文 the٣ thé the", // CJK, Unicode digit, combining mark
        "thé x́the 9́the _́the ́the", // Mn base rules (letter/digit base only)
        "𐐀́the the𐐀 theⅠ the²", // supplementary-base quirk, Nl, No
        // SUPPLEMENTARY Mn marks (U+101FD, 2 chars): the backward walk lands
        // on the mark's own low surrogate and stops, so the mark always
        // breaks the word — unlike a BMP mark over a letter base (r14)
        "a𐇽the x𐇽́the the𐇽 the",
        "", "   ", "...!!!")               // empty / no-word rows
      val df = rows.toDF("t")
      val fused = df.select(
        TextFunctions.stopwordCount(col("t"), words).as("c")).as[Long].collect().toSeq
      val regex = df.select(regexCount(col("t"), words).as("c")).as[Long].collect().toSeq
      fused shouldBe regex
      fused.head shouldBe 3L // sanity: the detector isn't trivially zero
    }

    it("randomized equivalence sweep against the regex twin") {
      val words = TextFunctions.EnglishStopwords
      val rnd = new scala.util.Random(42)
      // 𐇽 (supplementary Mn) contributes its two surrogate chars, so the
      // sweep also fuzzes lone high/low surrogates and recombined pairs
      val alphabet = "the and of to in a _2é文٣́Ⅰ²𐇽-., !".toCharArray
      val rows = Seq.fill(400)(
        Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
      val df = rows.toDF("t")
      val fused = df.select(
        TextFunctions.stopwordCount(col("t"), words).as("c")).as[Long].collect().toSeq
      val regex = df.select(regexCount(col("t"), words).as("c")).as[Long].collect().toSeq
      fused shouldBe regex
    }

    it("non-pure word lists keep the regex path (metacharacters count literally)") {
      // "don't" carries an apostrophe -> regex path; the quoted literal
      // must count, and semantics must equal the regex twin exactly
      val df = Seq("don't stop, i don't", "dont don''t").toDF("t")
      val words = Seq("don't")
      val fused = df.select(TextFunctions.stopwordCount(col("t"), words).as("c"))
        .as[Long].collect().toSeq
      val regex = df.select(regexCount(col("t"), words).as("c"))
        .as[Long].collect().toSeq
      fused shouldBe regex
      fused.head shouldBe 2L
    }
  }

  describe("fused gopher counts (graft_gopher_counts, r14)") {
    // every fused signal vs its live-regex twin, adversarial shapes first:
    // Java-MULTILINE terminator quirks (\r, \r\n, NEL, LS, PS — which the
    // anchored bullet/ellipsis regexes see as line breaks while
    // split('\n') does NOT), alternation overlap, supplementary letters,
    // lone surrogates, marks-only tokens, tab indents
    val adversarial = Seq(
      "plain words only",
      "- a\n  * b\nplain\nc...\n• d",
      "....  ..  ...  …  #…# ...…",
      "- cr\r* after-cr\r\n- after-crlf\u0085* after-nel\u2028- after-ls\u2029* after-ps",
      "dots...\rdots...\r\ndots…\u0085x...\u2028…\u2029...",
      "\t- tab bullet\n    * deep indent\n *no-indent-star\nx- not a bullet",
      "𐐀𐐀 abc123 123 ### _ _a ́ x́ 𐇽 a𐇽",
      "\uD800 \uDC00 𐀀 mixed\uD800text",
      "ends with spaces   ",
      "\n\n\n", "...", "…", "#", "", " ", "\r\n", "one",
      "trailing newline...\n", "...leading dots", "a.b.c .. . …. el…",
      "🙂 🙂x 文本 ٣٣ Ⅰ ²")

    it("every fused signal equals its regex twin on adversarial rows") {
      val df = adversarial.toDF("t")
      def both(fused: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
          regex: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
          name: String): Unit = {
        val f = df.select(fused(col("t")).cast("double").as("m")).as[Double].collect().toSeq
        val r = df.select(regex(col("t")).cast("double").as("m")).as[Double].collect().toSeq
        withClue(s"$name: ") { f shouldBe r }
      }
      both(TextFunctions.tokenCount(_), TextFunctions.tokenCountRegex(_), "tokenCount")
      both(TextFunctions.meanTokenLength(_), TextFunctions.meanTokenLengthRegex(_), "meanTokenLength")
      both(TextFunctions.symbolToWordRatio(_), TextFunctions.symbolToWordRatioRegex(_), "symbolToWordRatio")
      both(TextFunctions.bulletLineFrac(_), TextFunctions.bulletLineFracRegex(_), "bulletLineFrac")
      both(TextFunctions.ellipsisLineFrac(_), TextFunctions.ellipsisLineFracRegex(_), "ellipsisLineFrac")
      both(TextFunctions.alphaWordFrac(_), TextFunctions.alphaWordFracRegex(_), "alphaWordFrac")
    }

    it("randomized equivalence sweep over terminator/symbol/letter soup") {
      val rnd = new scala.util.Random(99)
      val alphabet = ("ab .…#-*•\t\n\r\u0085\u2028\u2029á𐐀" + "𐀀").toCharArray
      val rows = Seq.fill(400)(
        Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
      val df = rows.toDF("t")
      for ((fused, regex, name) <- Seq[
          (org.apache.spark.sql.Column => org.apache.spark.sql.Column,
           org.apache.spark.sql.Column => org.apache.spark.sql.Column, String)](
          (TextFunctions.tokenCount(_), TextFunctions.tokenCountRegex(_), "tokenCount"),
          (TextFunctions.meanTokenLength(_), TextFunctions.meanTokenLengthRegex(_), "meanTokenLength"),
          (TextFunctions.symbolToWordRatio(_), TextFunctions.symbolToWordRatioRegex(_), "symbolToWordRatio"),
          (TextFunctions.bulletLineFrac(_), TextFunctions.bulletLineFracRegex(_), "bulletLineFrac"),
          (TextFunctions.ellipsisLineFrac(_), TextFunctions.ellipsisLineFracRegex(_), "ellipsisLineFrac"),
          (TextFunctions.alphaWordFrac(_), TextFunctions.alphaWordFracRegex(_), "alphaWordFrac"))) {
        val f = df.select(fused(col("t")).cast("double").as("m")).as[Double].collect().toSeq
        val r = df.select(regex(col("t")).cast("double").as("m")).as[Double].collect().toSeq
        withClue(s"$name: ") { f shouldBe r }
      }
    }
  }

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
