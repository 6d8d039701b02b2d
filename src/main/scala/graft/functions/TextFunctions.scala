package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for large-scale training-data
  * pipelines. Everything here is built from codegen'd Catalyst expressions
  * (`org.apache.spark.sql.functions`) — no UDFs — so whole-stage codegen and
  * predicate pushdown stay intact at 100 TB scale.
  *
  * Capability surface extends the reference framework (waimak exposes raw
  * Spark columns to user transforms; see SURVEY.md §2.9) with the text ops an
  * LLM-data pipeline needs: token stats, quality scores, language ID,
  * fingerprinting.
  */
object TextFunctions {

  /** Tokens = maximal runs of non-whitespace. */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** All seven Gopher raw counts in ONE fused native pass
    * ([[graft.sql.GopherCounts]]): `[n_tokens, non_ws_chars,
    * symbol_matches, n_lines, bullet_lines, ellipsis_lines,
    * alpha_tokens]`. Every signal below reads an element of this array, so
    * a projection computing several signals over the same text column runs
    * the kernel ONCE (codegen subexpression elimination dedupes the
    * identical calls) — round 14: q50 paid six separate regex scans plus
    * their full recomputation inside gopherPass. Needs the graft functions
    * registered (GraftExtensions or graft.sql.functions.ensureRegistered);
    * each fused signal's regex twin is kept `private[graft]` below and
    * pinned equal in GopherFilterSpec. */
  private def gopherCounts(text: Column): Column =
    call_function("graft_gopher_counts", text)

  /** Token count as BIGINT (matches DuckDB `len(...)` type). */
  def tokenCount(text: Column): Column =
    element_at(gopherCounts(text), 1)

  private[graft] def tokenCountRegex(text: Column): Column =
    size(tokens(text)).cast("long")

  def charCount(text: Column): Column = length(text).cast("long")

  /** Mean token length, rounded to `scale` decimals. Total token chars =
    * length minus whitespace — same number as summing per-token lengths. */
  def meanTokenLength(text: Column, scale: Int = 4): Column = {
    val c = gopherCounts(text)
    round(element_at(c, 2).cast("double") /
      greatest(element_at(c, 1), lit(1L)).cast("double"), scale)
  }

  private[graft] def meanTokenLengthRegex(text: Column, scale: Int = 4): Column = {
    val totalChars = length(regexp_replace(text, "\\s+", ""))
    round(totalChars.cast("double") /
      greatest(tokenCountRegex(text), lit(1L)).cast("double"), scale)
  }

  /** Punctuation ratio: punct chars / all chars (explicit class — identical
    * semantics in Java regex and RE2-based engines). */
  def punctRatio(text: Column, scale: Int = 6): Column = {
    val punct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))
    round(punct.cast("double") / greatest(length(text), lit(1)).cast("double"), scale)
  }

  /** English stopword ratio over tokens. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** True when the fused native counter is exactly regex-equivalent: every
    * word a nonempty pure-`[a-z0-9_]` token, so `\b<word>\b` can only match
    * a maximal ASCII word run equal to the word (see
    * [[graft.sql.WordSetsCount]] for the proof sketch). */
  private def pureWords(words: Seq[String]): Boolean =
    words.nonEmpty && words.forall(w => w.nonEmpty && w.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'))

  /** One fused pass counting maximal word runs per literal word set —
    * replaces one full regex scan PER SET (round 13: the q16 projection
    * paid ~10 scans per row). Needs the graft functions registered
    * (GraftExtensions or graft.sql.functions.ensureRegistered). */
  private def wordSetsCount(text: Column, sets: Seq[Seq[String]]): Column =
    call_function("graft_word_sets_count", lower(text), typedLit(sets))

  def stopwordCount(text: Column, words: Seq[String]): Column =
    if (pureWords(words)) element_at(wordSetsCount(text, Seq(words)), 1)
    else {
      // words are caller-supplied: quote them so regex metacharacters ("c++",
      // "don't") count literally instead of corrupting the alternation; the
      // regex path also keeps non-ASCII words exactly regex-semantic
      val quoted = words.map(java.util.regex.Pattern.quote)
      size(regexp_extract_all(lower(text), lit(quoted.mkString("\\b(", "|", ")\\b")), lit(0))).cast("long")
    }

  /** NOTE: the numerator matches stopwords at word boundaries anywhere
    * (including inside punctuation-joined runs like "the-of"), while the
    * denominator counts whitespace tokens — on punctuation-heavy text the
    * ratio can exceed 1. Downstream consumers (qualityScore) saturate it. */
  def stopwordRatio(text: Column, scale: Int = 6): Column =
    round(
      stopwordCount(text, EnglishStopwords).cast("double") /
        greatest(tokenCount(text), lit(1L)).cast("double"),
      scale)

  /** Composite quality score in [0,1]: penalises very short docs, high
    * punctuation density and stopword-free (non-natural) text. Deterministic
    * closed-form so it can be oracle-checked in SQL. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(charCount(text).cast("double") / lit(500.0), lit(1.0))
    val punctPen  = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    round((lenScore + punctPen + stopScore) / lit(3.0), 6)
  }

  /** Language-ID by marker-word counting (n-gram-free heuristic; CJK detected
    * by codepoint class). Deterministic priority order on ties. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Fixed marker-set order of [[langCounts]]. */
  val LangOrder: Seq[String] = Seq("en", "de", "fr", "es")

  /** All four language marker counts from ONE fused text pass —
    * `array(en, de, fr, es)`. Call sites needing several of them (q16's
    * projection, [[languageId]]) share the identical subtree, which
    * Spark's subexpression elimination evaluates once per row. */
  def langCounts(text: Column): Column =
    wordSetsCount(text, LangOrder.map(LangMarkers))

  def langScore(text: Column, langKey: String): Column =
    element_at(langCounts(text), LangOrder.indexOf(langKey) + 1)

  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long")

  /** argmax over language scores with fixed priority zh > en > de > fr > es. */
  def languageId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val fr = langScore(text, "fr"); val es = langScore(text, "es")
    when(cjkCount(text) > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** BPE-style pretokenization: optional-leading-space letter runs, digit
    * runs, and punctuation runs — the GPT-2 pretokenizer shape, restricted
    * to RE2-safe constructs (no lookahead) so the count is reproducible in
    * any regex engine. Counts approximate subword-tokenizer input units far
    * better than whitespace splitting on punctuation-heavy or code text. */
  val BpeTokenPattern: String = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  // ---------------------------------------------- repetition signals ---
  // Gopher-style repetition filters (Rae et al. 2021 use line/paragraph and
  // top-n-gram fractions; the token-level forms below are the variant that
  // is meaningful for single-line corpora).
  //
  // The counting runs in ONE fused JVM loop per row (hash-map occurrence
  // counts): the equivalent higher-order-function chain
  // (array_max(transform(array_distinct(toks), t -> size(filter(toks, ...)))))
  // is interpreted AND quadratic in tokens — measured 3.5 ms/row on the
  // sf0.1 corpus (~175 s for 50k docs) vs ~40 µs/row for this loop. The
  // division + rounding stay in Catalyst so a SQL oracle reproduces the
  // ratios exactly from the same integer counts.

  /** (distinct tokens, max token count, tokens, max bigram count, bigrams)
    * — one counting pass. Bigram edge: < 2 tokens yields one degenerate
    * bigram (the remaining tokens joined; "" for an empty doc).
    *
    * Returns a TUPLE, not a named case class: Janino cannot resolve
    * methods on application-classloader classes inside generated code, so
    * a case-class result knocks the whole surrounding projection out of
    * codegen ("No applicable constructor/method found" fallback warnings).
    * Tuple accessors live in Spark's own classloader and stay codegen'd;
    * the field-name indirection below keeps call sites readable. */
  private val repFields = Map("nDistinct" -> "_1", "topTok" -> "_2",
    "nToks" -> "_3", "topBg" -> "_4", "nBgs" -> "_5")

  private val repStatsUdf = udf { (txt: String) =>
    val toks =
      if (txt == null) Array.empty[String]
      else txt.split("\\s+").filter(_.nonEmpty)
    val tokCounts = new java.util.HashMap[String, Int](toks.length * 2)
    var topTok = 0
    toks.foreach { t =>
      val c = tokCounts.merge(t, 1, Integer.sum)
      if (c > topTok) topTok = c
    }
    val nBgs = math.max(toks.length - 1, 1)
    val bgCounts = new java.util.HashMap[String, Int](nBgs * 2)
    var topBg = 0
    var i = 0
    while (i < nBgs) {
      val bg =
        if (toks.isEmpty) ""
        else if (i + 1 < toks.length) toks(i) + " " + toks(i + 1)
        else toks(i)
      val c = bgCounts.merge(bg, 1, Integer.sum)
      if (c > topBg) topBg = c
      i += 1
    }
    (tokCounts.size, topTok, toks.length, topBg, nBgs)
  }

  /** Shannon entropy (nats) of the document's own token distribution —
    * the quality signal separating natural text (high) from templated /
    * repeated boilerplate (low). Same fused one-pass counting rationale
    * as the repetition stats; the -Σ p·ln p accumulates over hash-map
    * order, whose float-sum variation vs a SQL engine's grouping order is
    * ~1e-15 and vanishes at the output rounding. 0.0 for empty docs. */
  private val tokenEntropyUdf = udf { (txt: String) =>
    val toks =
      if (txt == null) Array.empty[String]
      else txt.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) 0.0
    else {
      val counts = new java.util.HashMap[String, Int](toks.length * 2)
      toks.foreach(t => counts.merge(t, 1, Integer.sum))
      val n = toks.length.toDouble
      var h = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) { val p = it.next() / n; h -= p * math.log(p) }
      h
    }
  }

  def tokenEntropy(text: Column, scale: Int = 4): Column =
    round(tokenEntropyUdf(text), scale)

  /** Distinct-token ratio: |distinct tokens| / |tokens| — low values mean a
    * repetitive document. 0 for empty docs. */
  def distinctTokenRatio(text: Column, scale: Int = 4): Column = {
    val s = repStatsUdf(text)
    round(s.getField(repFields("nDistinct")).cast("double")
      / greatest(s.getField(repFields("nToks")), lit(1)).cast("double"), scale)
  }

  /** Fraction of tokens taken by the single most frequent token. */
  def topTokenFrac(text: Column, scale: Int = 4): Column = {
    val s = repStatsUdf(text)
    round(s.getField(repFields("topTok")).cast("double")
      / greatest(s.getField(repFields("nToks")), lit(1)).cast("double"), scale)
  }

  /** Fraction of word bigrams taken by the most frequent bigram — high
    * values flag boilerplate/templated text that token-level stats miss.
    * (Identical repStats subtrees across the three signals collapse to one
    * evaluation per row via Spark's common-subexpression elimination.) */
  def topBigramFrac(text: Column, scale: Int = 4): Column = {
    val s = repStatsUdf(text)
    round(s.getField(repFields("topBg")).cast("double")
      / greatest(s.getField(repFields("nBgs")), lit(1)).cast("double"), scale)
  }

  // ------------------------------------------- Gopher-style doc filters ---
  // The full document-level rule set of Rae et al. 2021 (§A1.1): word-count
  // bounds, mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis
  // line fractions, alphabetic-word fraction, minimum stop-word presence.
  // All pure codegen'd regex/arith — patterns restricted to constructs with
  // identical semantics in Java regex and RE2, so a SQL engine replays them.

  /** Symbols counted by the symbol-to-word rule: '#', the one-char ellipsis,
    * and a literal "..." (greedy leftmost match, so "...." counts once —
    * same in any leftmost-longest engine). */
  def symbolToWordRatio(text: Column, scale: Int = 6): Column = {
    val c = gopherCounts(text)
    round(element_at(c, 3).cast("double") /
      greatest(element_at(c, 1), lit(1L)).cast("double"), scale)
  }

  private[graft] def symbolToWordRatioRegex(text: Column, scale: Int = 6): Column = {
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
    round(symbols.cast("double") /
      greatest(tokenCountRegex(text), lit(1L)).cast("double"), scale)
  }

  /** Fraction of lines starting with a bullet ( -, *, or • after optional
    * indent). `[ \t]` rather than `\s` so the indent cannot swallow the
    * newline of an empty previous line. */
  def bulletLineFrac(text: Column, scale: Int = 6): Column = {
    val c = gopherCounts(text)
    round(element_at(c, 5).cast("double") /
      greatest(element_at(c, 4), lit(1L)).cast("double"), scale)
  }

  private[graft] def bulletLineFracRegex(text: Column, scale: Int = 6): Column = {
    val bullets = size(regexp_extract_all(text, lit("(?m)^[ \\t]*[-*•]"), lit(0)))
    val lines = size(split(text, "\n"))
    round(bullets.cast("double") / greatest(lines, lit(1)).cast("double"), scale)
  }

  /** Fraction of lines ending with an ellipsis ("..." or the one-char form). */
  def ellipsisLineFrac(text: Column, scale: Int = 6): Column = {
    val c = gopherCounts(text)
    round(element_at(c, 6).cast("double") /
      greatest(element_at(c, 4), lit(1L)).cast("double"), scale)
  }

  private[graft] def ellipsisLineFracRegex(text: Column, scale: Int = 6): Column = {
    val ell = size(regexp_extract_all(text, lit("(?m)(\\.\\.\\.|…)$"), lit(0)))
    val lines = size(split(text, "\n"))
    round(ell.cast("double") / greatest(lines, lit(1)).cast("double"), scale)
  }

  /** Fraction of tokens containing at least one letter. */
  def alphaWordFrac(text: Column, scale: Int = 6): Column = {
    val c = gopherCounts(text)
    round(element_at(c, 7).cast("double") /
      greatest(element_at(c, 1), lit(1L)).cast("double"), scale)
  }

  private[graft] def alphaWordFracRegex(text: Column, scale: Int = 6): Column = {
    val alpha = size(regexp_extract_all(text, lit("\\S*\\p{L}\\S*"), lit(0)))
    round(alpha.cast("double") /
      greatest(tokenCountRegex(text), lit(1L)).cast("double"), scale)
  }

  /** Density of code punctuation ({}[]()<>;=) per character — near zero in
    * prose, high in most programming languages. */
  def codePunctDensity(text: Column, scale: Int = 4): Column = {
    val punct = size(regexp_extract_all(text, lit("[{}\\[\\]()<>;=]"), lit(0)))
    round(punct.cast("double") / greatest(length(text), lit(1)).cast("double"), scale)
  }

  /** Semicolons per non-empty line — statement-terminated languages. */
  def semicolonPerLine(text: Column, scale: Int = 4): Column = {
    val semis = size(regexp_extract_all(text, lit(";"), lit(0)))
    val lines = size(filter(split(text, "\n"), l => length(l) > 0))
    round(semis.cast("double") / greatest(lines, lit(1)).cast("double"), scale)
  }

  /** Fraction of non-empty lines starting with an indent (4 spaces / tab) —
    * block-structured source and indented code fences. */
  def indentLineFrac(text: Column, scale: Int = 4): Column = {
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    val indented = size(filter(lines, l => l.rlike("^(    |\\t)")))
    round(indented.cast("double") / greatest(size(lines), lit(1)).cast("double"), scale)
  }

  /** Code-vs-prose gate over the three signals — the mix-curation split
    * ("route code to the code pipeline, prose to the text one"). Thresholds
    * are parameters; defaults separate typical source from typical prose by
    * a wide margin on all three axes. */
  def isCodeLike(text: Column,
      minPunctDensity: Double = 0.01,
      minSemisPerLine: Double = 0.5,
      minIndentFrac: Double = 0.2): Column =
    codePunctDensity(text) > minPunctDensity ||
      semicolonPerLine(text) > minSemisPerLine ||
      indentLineFrac(text) > minIndentFrac

  /** Gopher's stop-word presence list (distinct-word hits, not counts). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many of the GopherStopwords appear at least once. */
  def stopwordPresence(text: Column): Column = {
    // one fused pass, one singleton set per stopword: presence = count>0,
    // exactly the old per-word `rlike \b<w>\b` (>=1 match <=> count>0)
    val c = wordSetsCount(text, GopherStopwords.map(Seq(_)))
    GopherStopwords.indices
      .map(i => when(element_at(c, i + 1) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
  }

  /** The full Gopher document filter with the paper's default thresholds.
    * Thresholds are parameters so corpus-specific tuning doesn't fork the
    * expression tree. */
  def gopherPass(
      text: Column,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwords: Long = 2L): Column = {
    val n = tokenCount(text)
    n.geq(minWords) && n.leq(maxWords) &&
      meanTokenLength(text).between(minMeanWordLen, maxMeanWordLen) &&
      symbolToWordRatio(text) <= maxSymbolRatio &&
      bulletLineFrac(text) <= maxBulletFrac &&
      ellipsisLineFrac(text) <= maxEllipsisFrac &&
      alphaWordFrac(text) >= minAlphaFrac &&
      stopwordPresence(text) >= minStopwords
  }

  /** Canonical fingerprint: lowercase, collapse whitespace, trim, md5. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Canonical text normalization: lowercase, collapse whitespace runs to a
    * single space, trim. The string the [[fingerprint]] hashes — exposed so
    * pipelines can store the normalized form itself. Pure codegen'd
    * regexp/lower/trim, no UDF. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Aggressive normalization: additionally strip every character outside
    * letters, digits and whitespace (unicode classes, so accented letters
    * and non-Latin scripts survive; punctuation and symbols do not). */
  def normalizeAggressive(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", ""), "\\s+", " "))

  /** HTML → text: drop script/style elements WITH their contents, replace
    * remaining tags and comments with spaces (so `a<br>b` stays two
    * tokens), decode the five XML entities plus numeric escapes' common
    * ampersand form, collapse whitespace. Regex-based — the standard
    * web-corpus preprocessing cut, not a conforming HTML5 parser (CDATA
    * and conditional comments are out of scope; an UNCLOSED `<script>`
    * never matches the element pass, so only its tags strip and the
    * script text leaks into the output — run a quality filter downstream
    * if that matters). All passes are RE2-safe codegen'd regexp_replace —
    * a narrow map at any scale. */
  def stripHtml(html: Column): Column = {
    // two explicit passes, not one with a backreference: RE2 (the DuckDB
    // oracle's engine) has no backreferences
    val noScript = regexp_replace(regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTag,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // PII scrubbing. Pattern notes: the regexes are RE2-compatible (no
  // backtracking constructs) so the DuckDB oracle can mirror them verbatim.
  // Replacement order matters — emails first (their domains contain dots a
  // later rule must not see), then IPv4, then phone numbers (the +-prefixed
  // international form; a bare-digit-run rule would eat ids and amounts).
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val PhoneRe = "\\+\\d[\\d .-]{7,}\\d"

  /** Redact emails, IPv4 addresses and international phone numbers with
    * typed placeholders. Three codegen'd regexp_replace passes per row —
    * a narrow map at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Match counts per PII class (before redaction) — the audit metric a
    * scrubbing pass reports alongside the rewritten text. */
  def piiEmailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def piiIpCount(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")
  def piiPhoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")

  /** Character n-gram shingles (distinct). Guards short strings by clamping
    * the range start so the sequence is always ascending. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
        i => text.substr(i, lit(n))))
}
