package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}

/** Round-3 curation additions: JSON extraction, chunking, normalization,
  * PII redaction, exact-substring duplication profile. */
class CurationOpsSpec extends SparkTestBase
  with org.scalatest.matchers.should.Matchers {

  import spark.implicits._

  describe("Semistructured.extractJson") {
    it("extracts typed fields in one parse and nulls malformed rows") {
      val df = Seq(
        (1L, """{"k": 7, "s": "x"}"""),
        (2L, """{"k": 9}"""),
        (3L, """not json"""),
        (4L, null.asInstanceOf[String])).toDF("id", "props")
      val out = Semistructured.extractJson(df, "props",
        Seq(StructField("k", LongType), StructField("s", StringType)))
        .orderBy("id")
        .collect()
      assert(out.map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3)))).toSeq ===
        Seq((1L, Some(7L), Some("x")), (2L, Some(9L), None),
          (3L, None, None), (4L, None, None)))
    }

    it("parses the JSON document once, not once per field") {
      // non-foldable input (a literal LocalRelation constant-folds the whole
      // parse away); CollapseProject must keep the one from_json rather than
      // inlining a copy per projected field
      val df = spark.range(10).withColumn("props",
        concat(lit("""{"a":"""), col("id"), lit(""","b":2,"c":3}""")))
      val plan = Semistructured.extractJson(df, "props",
        Seq(StructField("a", LongType), StructField("b", LongType),
          StructField("c", LongType)))
        .queryExecution.optimizedPlan.toString()
      assert("from_json".r.findAllIn(plan).size === 1,
        s"expected a single from_json in:\n$plan")
    }
  }

  describe("Chunking") {
    it("char chunks cover the text with the configured overlap") {
      val df = Seq((1L, "abcdefghij")).toDF("id", "text") // 10 chars
      val out = Chunking.chunkChars(df, Seq("id"), "text", size = 4, stride = 3)
        .orderBy("chunk_ix").collect()
      assert(out.map(_.getString(4)).toSeq ===
        Seq("abcd", "defg", "ghij", "j"))
      assert(out.map(_.getLong(2)).toSeq === Seq(0L, 3L, 6L, 9L))
    }

    it("token chunks slice the token stream and rejoin with single spaces") {
      val df = Seq((1L, "a  b\tc d e")).toDF("id", "text")
      val out = Chunking.chunkTokens(df, Seq("id"), "text",
        windowTokens = 3, strideTokens = 2).orderBy("chunk_ix").collect()
      assert(out.map(_.getString(4)).toSeq === Seq("a b c", "c d e", "e"))
      assert(out.map(_.getLong(3)).toSeq === Seq(3L, 3L, 1L))
    }

    it("empty and null texts produce zero chunks") {
      val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "ok"))
        .toDF("id", "text")
      assert(Chunking.chunkChars(df, Seq("id"), "text", 5, 5).count() === 1)
      assert(Chunking.chunkTokens(df, Seq("id"), "text", 5, 5).count() === 1)
    }

    it("chunking is a narrow map — no exchange in the plan") {
      val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      val plan = Chunking.chunkTokens(docs, Seq("doc_id"), "text", 32, 24)
        .queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    }
  }

  describe("TextFunctions normalization and PII") {
    it("normalizeText lowercases, collapses whitespace, trims") {
      val out = Seq("  Fast\t\tQUERY  plan\n").toDF("t")
        .select(TextFunctions.normalizeText($"t")).head.getString(0)
      assert(out === "fast query plan")
    }

    it("normalizeAggressive also strips punctuation but keeps letters/digits") {
      val out = Seq("Hello, wörld! 42?").toDF("t")
        .select(TextFunctions.normalizeAggressive($"t")).head.getString(0)
      assert(out === "hello wörld 42")
    }

    it("redactPii erases emails, IPs and phones; counts see each match") {
      val s = "mail a.b+c@ex-1.org or 10.0.0.255 or call +44 20-7946 0958 now"
      val row = Seq(s).toDF("t").select(
        TextFunctions.redactPii($"t"),
        TextFunctions.piiEmailCount($"t"),
        TextFunctions.piiIpCount($"t"),
        TextFunctions.piiPhoneCount($"t")).head
      assert(row.getString(0) === "mail <EMAIL> or <IP> or call <PHONE> now")
      assert((row.getLong(1), row.getLong(2), row.getLong(3)) === ((1L, 1L, 1L)))
    }

    it("redaction leaves clean text untouched") {
      val s = "no contact details here, just 42 words and 3.14"
      val out = Seq(s).toDF("t")
        .select(TextFunctions.redactPii($"t")).head.getString(0)
      assert(out === s)
    }

    it("stripHtml drops script/style bodies, tags, comments; decodes entities") {
      val html = """<html><head><STYLE>p {x}</STYLE><script src="a.js"></script>
        |</head><body class="c"><h1>Title</h1><p>a&amp;b &lt;tag&gt; it&#39;s
        |<b>bold</b></p><script>if (1 < 2) { alert("hi"); }</script>
        |<!-- secret comment --><br>end</body></html>""".stripMargin
      val out = Seq(html).toDF("t")
        .select(TextFunctions.stripHtml($"t")).head.getString(0)
      assert(out === """Title a&b <tag> it's bold end""")
    }

    it("stripHtml double-encoded entities decode exactly once") {
      // &amp;lt; is the TEXT "&lt;", not a tag opener
      val out = Seq("x &amp;lt;b&amp;gt; y").toDF("t")
        .select(TextFunctions.stripHtml($"t")).head.getString(0)
      assert(out === "x &lt;b&gt; y")
    }
  }

  describe("Boilerplate.stripBoilerplate") {
    it("strips group-frequent lines, preserves order, respects minDocs") {
      val docs = Seq(
        (1L, "d", "FOOTER\nalpha\nbeta"),
        (2L, "d", "alpha\nFOOTER\ngamma"),
        (3L, "d", "FOOTER\ndelta"),
        (4L, "d", "epsilon\nFOOTER"),
        (5L, "d", "zeta\nFOOTER"),
        (6L, "d", "FOOTER"), // all-boilerplate doc -> empty, not dropped
        (10L, "e", "FOOTER\nsolo")) // group below minDocs: untouched
        .toDF("id", "grp", "text")
      val out = Boilerplate.stripBoilerplate(docs, "id", "grp", "text",
        maxDocFrac = 0.5, minDocs = 5L)
        .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
      assert(out(1L) === "alpha\nbeta") // FOOTER (6/6 docs) stripped, order kept
      assert(out(2L) === "alpha\ngamma") // alpha in 2/6 = 0.33 <= 0.5: kept
      assert(out(4L) === "epsilon")
      assert(out(6L) === "") // survived as a row
      assert(out(10L) === "FOOTER\nsolo") // 1-doc group: no boilerplate verdicts
      assert(out.size === 7)
    }

    it("repeated boilerplate within one doc counts that doc once") {
      val docs = (1L to 6L).map(i => (i, "g", s"AD\nAD\ncontent $i"))
        .toDF("id", "grp", "text")
      val out = Boilerplate.stripBoilerplate(docs, "id", "grp", "text",
        maxDocFrac = 0.5, minDocs = 5L)
        .as[(Long, String, String)].collect()
      out.foreach(r => assert(r._3 === s"content ${r._1}"))
    }
  }

  describe("Curation.report") {
    it("summarizes per source with sane signal ranges and dup detection") {
      val docs = Seq(
        ("web", "the cat sat on the mat and it is a fine day in the sun"),
        ("web", "the cat sat on the mat and it is a fine day in the sun"), // exact dup
        ("web", "an entirely different document about the weather and rain today"),
        ("code", "x x x x x x x x")).toDF("source", "text")
      val rep = Curation.report(docs, "source", "text",
        gopherMinWords = 5L, gopherMinStopwords = 1L, gopherMinAlphaFrac = 0.5)
      val bySource = rep.collect().map(r => r.getAs[String]("source") -> r).toMap
      assert(bySource("web").getAs[Long]("docs") === 3L)
      // one of three web docs is an exact dup
      assert(math.abs(bySource("web").getAs[Double]("exact_dup_rate") - 0.3333) < 1e-4)
      assert(bySource("code").getAs[Double]("exact_dup_rate") === 0.0)
      // repeated-token source scores zero entropy and fails gopher
      assert(bySource("code").getAs[Double]("mean_token_entropy") === 0.0)
      assert(bySource("code").getAs[Double]("gopher_pass_rate") === 0.0)
      assert(bySource("web").getAs[Double]("mean_token_entropy") > 1.0)
      // only the long-worded doc clears Gopher's mean-word-length bound;
      // the cat-sat pair averages ~2.8 chars/word, below the 3.0 floor
      assert(math.abs(bySource("web").getAs[Double]("gopher_pass_rate") - 0.3333) < 1e-4)
      assert(bySource("web").getAs[Long]("total_tokens") === (15L + 15L + 10L))
    }
  }

  describe("Outliers.robustZ") {
    it("flags the planted outlier and no one else") {
      val base = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 3)))
      val df = (base :+ (("a", 99L, 1e6))).toDF("grp", "id", "v")
      val out = Outliers.robustZ(df, Seq("grp"), "v", k = 3.5)
        .where($"outlier").select($"id").collect()
      assert(out.map(_.getLong(0)).toSeq === Seq(99L))
    }

    it("constant groups (MAD=0) yield null z and no outliers") {
      val df = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0))
        .toDF("grp", "id", "v")
      val out = Outliers.robustZ(df, Seq("grp"), "v").collect()
      assert(out.forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
      assert(out.forall(!_.getBoolean(4)))
    }

    it("keeps null-group rows (null-safe stats joins)") {
      val df = Seq(
        (Option("a"), 1L, 1.0), (Option("a"), 2L, 2.0), (Option("a"), 3L, 3.0),
        (Option.empty[String], 4L, 1.0), (Option.empty[String], 5L, 2.0),
        (Option.empty[String], 6L, 3.0))
        .toDF("grp", "id", "v")
      val out = Outliers.robustZ(df, Seq("grp"), "v")
      assert(out.count() === 6, "null-group rows must survive the stats joins")
      assert(out.where($"grp".isNull && $"robust_z".isNotNull).count() === 3)
    }

    it("broadcasts the group stats — no shuffle of the data side") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events ns ts
      val df = spark.read.parquet(s"${sf()}/events.parquet")
        .select($"event_id", $"event_type", ($"value" * 1.0).as("v"))
      val plan = Outliers.robustZ(df, Seq("event_type"), "v")
        .queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
    }
  }

  describe("Outliers.winsorize") {
    it("clips to the per-group percentile bounds and flags clipped rows") {
      // group a: 1..100; p10=10.9, p90=90.1 (exact interpolation)
      val df = (1 to 100).map(i => ("a", i.toLong, i.toDouble)).toDF("grp", "id", "v")
      val out = Outliers.winsorize(df, Seq("grp"), "v", pLo = 0.1, pHi = 0.9)
      assert(out.count() === 100)
      val clipped = out.where($"clipped").select($"id").as[Long].collect().sorted
      assert(clipped.toSeq === ((1L to 10L) ++ (91L to 100L)))
      // clipped values sit exactly at the bounds; interior values untouched
      assert(math.abs(out.where($"id" === 1L).select($"v_w").as[Double].head() - 10.9) < 1e-9)
      assert(math.abs(out.where($"id" === 100L).select($"v_w").as[Double].head() - 90.1) < 1e-9)
      assert(out.where($"id" === 50L).select($"v_w").as[Double].head() === 50.0)
    }

    it("null values pass through unclipped; groups are independent") {
      val df = Seq(
        (Option("a"), 1L, Option(1.0)), (Option("a"), 2L, Option(2.0)),
        (Option("a"), 3L, Option(1000.0)), (Option("a"), 4L, Option.empty[Double]),
        (Option.empty[String], 5L, Option(7.0)), (Option.empty[String], 6L, Option(8.0)))
        .toDF("grp", "id", "v")
      val out = Outliers.winsorize(df, Seq("grp"), "v", pLo = 0.25, pHi = 0.75)
      assert(out.count() === 6) // null group survives (null-safe join)
      assert(out.where($"id" === 4L).select($"clipped").as[Boolean].head() === false)
      assert(out.where($"id" === 4L).where($"v_w".isNull).count() === 1)
    }

    it("winsorize broadcasts bounds — the data side never shuffles") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"${sf()}/events.parquet")
        .select($"event_id", $"event_type", ($"value" * 1.0).as("v"))
      val plan = Outliers.winsorize(df, Seq("event_type"), "v")
        .queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
    }
  }

  describe("Ranking.vocabulary") {
    it("ranks terms by count with deterministic ties and exact coverage") {
      val df = Seq("b b b a a c", "a d").toDF("text")
        .withColumn("doc_id", monotonically_increasing_id())
      val out = Ranking.vocabulary(df, "text", topN = 3).orderBy("rank").collect()
      // counts: a=3, b=3, c=1, d=1 → ties: a before b, c before d
      assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq(("a", 3L, 1L), ("b", 3L, 2L), ("c", 1L, 3L)))
      assert(out.map(_.getDouble(3)).toSeq === Seq(0.375, 0.75, 0.875))
    }
  }

  describe("Sampling.mixtureSample") {
    it("hits the weight-proportional composition without upsampling") {
      val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
        .select($"doc_id", $"lang")
      val out = Sampling.mixtureSample(docs, "lang",
        Map("en" -> 2.0, "de" -> 1.0, "fr" -> 1.0), rankKey = $"doc_id")
      val byLang = out.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // counts en=218 de=70 fr=64 -> scale = 64 -> caps 128/64/64
      assert(byLang === Map("en" -> 128L, "de" -> 64L, "fr" -> 64L))
    }

    it("is deterministic under repartitioning and drops unweighted sources") {
      val docs = spark.read.parquet(s"${sf()}/documents.parquet")
        .select($"doc_id", $"lang")
      val weights = Map("en" -> 3.0, "zh" -> 1.0)
      val a = Sampling.mixtureSample(docs, "lang", weights, $"doc_id")
        .orderBy("doc_id").collect().toSeq
      val b = Sampling.mixtureSample(docs.repartition(11, $"doc_id"), "lang",
        weights, $"doc_id").orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.map(_.getString(0)).toSet.subsetOf(Set("en", "zh")))
    }
  }

  describe("Sampling.mixtureSampleWithReplacement") {
    it("upsamples small sources toward the weighted composition; anchor keeps one epoch") {
      val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
        .select($"doc_id", $"lang")
      val weights = Map("en" -> 0.25, "de" -> 0.25, "fr" -> 0.25, "zh" -> 0.25)
      val out = Sampling.mixtureSampleWithReplacement(docs, "lang", weights,
        key = $"doc_id", maxEpochs = 4)
      val byLang = out.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      byLang.keySet shouldBe Set("en", "de", "fr", "zh") // 'es' unweighted -> dropped
      // en is the most over-supplied source at equal weights -> it anchors:
      // exactly its corpus, every row at epoch 0 only
      val en = docs.where($"lang" === "en").count()
      byLang("en") shouldBe en
      out.where($"lang" === "en").agg(max($"epoch")).head.getLong(0) shouldBe 0L
      // the upsampled sources land within 5% of the anchor's share (the
      // fractional epoch is a hash-binomial draw over ~70 rows here)
      Seq("de", "fr", "zh").foreach { l =>
        byLang(l).toDouble shouldBe (en.toDouble +- en * 0.05)
      }
      // replicas are full copies at distinct epochs
      val perDoc = out.where($"lang" === "de").groupBy("doc_id")
        .agg(count(lit(1)).as("c"), countDistinct($"epoch").as("e")).collect()
      perDoc.foreach(r => r.getLong(1) shouldBe r.getLong(2))
    }

    it("is deterministic under repartitioning and honors maxEpochs") {
      val docs = spark.read.parquet(s"${sf()}/documents.parquet")
        .select($"doc_id", $"lang")
      val weights = Map("en" -> 1.0, "zh" -> 50.0) // zh wants >> maxEpochs
      val a = Sampling.mixtureSampleWithReplacement(docs, "lang", weights,
        $"doc_id", maxEpochs = 3).orderBy("doc_id", "epoch").collect().toSeq
      val b = Sampling.mixtureSampleWithReplacement(docs.repartition(7, $"doc_id"),
        "lang", weights, $"doc_id", maxEpochs = 3)
        .orderBy("doc_id", "epoch").collect().toSeq
      assert(a === b)
      val zhEpochs = a.filter(_.getAs[String]("lang") == "zh")
        .map(_.getAs[Long]("epoch"))
      zhEpochs.max should be <= 2L // epochs 0..maxEpochs-1 only when capped
      // capped exactly: every zh row repeats exactly maxEpochs times
      val docsZh = spark.read.parquet(s"${sf()}/documents.parquet")
        .where($"lang" === "zh").count()
      zhEpochs.size.toLong shouldBe docsZh * 3
    }
  }

  describe("Dedup.substringDupProfile") {
    it("flags docs sharing verbatim token windows, ignores unique docs") {
      val shared = "one two three four five six seven eight"
      val docs = Seq(
        (1L, shared + " a"),
        (2L, shared + " b"),
        (3L, "totally different words in this unique document here"),
        (4L, ""),
        (5L, "short")).toDF("doc_id", "text")
      val out = Dedup.substringDupProfile(docs, "doc_id", "text",
        windowTokens = 8, minShare = 0.4)
        .orderBy("doc_id").collect()
      // docs 1/2: 2 windows each (9 tokens, window 8), the first is shared
      assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))).toSeq ===
        Seq((1L, 2L, 1L, true), (2L, 2L, 1L, true),
          (3L, 1L, 0L, false), (4L, 0L, 0L, false), (5L, 1L, 0L, false)))
    }

    it("is independent of input partitioning") {
      val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      val a = Dedup.substringDupProfile(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val b = Dedup.substringDupProfile(docs.repartition(7, $"lang"), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(a === b)
    }
  }

  describe("Urls.canonicalizeUrl / registrableDomain") {
    import org.apache.spark.sql.functions.col

    def canon(urls: String*): Seq[String] =
      urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].collect().toSeq

    it("normalizes case, default ports, www, fragments, trailing slashes") {
      assert(canon(
        "HTTPS://WWW.Site.COM:443/A/B/#frag",
        "http://Site.com:80/x",
        "http://site.com:8080/x/",
        "https://site.com/") === Seq(
        "https://site.com/A/B", // path case is significant, host case is not
        "http://site.com/x",
        "http://site.com:8080/x", // non-default port survives
        "https://site.com"))
    }

    it("strips tracking params in leading and interior positions, keeps the rest in order") {
      assert(canon(
        "https://s.com/p?utm_source=x&id=1&gclid=z&keep=2",
        "https://s.com/p?id=1&fbclid=y",
        "https://s.com/p?utm_campaign=only",
        "https://s.com/p?b=2&a=1") === Seq(
        "https://s.com/p?id=1&keep=2",
        "https://s.com/p?id=1",
        "https://s.com/p", // all-tracking query vanishes entirely
        "https://s.com/p?b=2&a=1")) // param ORDER preserved, never sorted
    }

    it("extracts the registrable domain with a single-label passthrough") {
      assert(Seq("https://a.b.news.example.com/x", "http://localhost:8080/x")
        .toDF("u").select(Urls.registrableDomain(col("u"))).as[String]
        .collect().toSeq === Seq("example.com", "localhost"))
    }
  }

  describe("Similarity.decontaminateByEmbedding") {
    import org.apache.spark.sql.functions.col

    it("flags rows close to any eval vector; ties resolve to the highest eval id") {
      val corpus = Seq(
        (1L, Array(1.0f, 0.0f)), // identical to both eval vectors -> cos 1.0
        (2L, Array(0.0f, 1.0f)), // orthogonal -> cos 0.0
        (3L, Array(0.9f, 0.1f))  // cos ~0.9939 -> above threshold
      ).toDF("id", "vec")
      val evalSet = Seq(
        (100L, Array(1.0f, 0.0f)),
        (102L, Array(1.0f, 0.0f)) // duplicate eval vector -> tie on cos
      ).toDF("id", "vec")
      val out = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", threshold = 0.95)
        .orderBy("id").collect()
      assert(out.map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq ===
        Seq((1L, 102L, true), (2L, 102L, false), (3L, 102L, true)))
      assert(out(0).getDouble(1) === 1.0)
      assert(out(1).getDouble(1) === 0.0)
    }

    it("is partitioning-independent") {
      val corpus = Seq.tabulate(40)(i =>
        (i.toLong, Array((i % 5).toFloat + 1f, 1.0f))).toDF("id", "vec")
      val evalSet = Seq((0L, Array(3.0f, 1.0f))).toDF("id", "vec")
      val a = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", 0.99)
        .orderBy("id").collect().toSeq
      val b = Similarity.decontaminateByEmbedding(
        corpus.repartition(7), "id", "vec", evalSet, "id", "vec", 0.99)
        .orderBy("id").collect().toSeq
      assert(a === b)
    }

    it("literal-matrix fast path is row-for-row identical to the cross join, dup ids and ties included") {
      // duplicate corpus ids (both paths must merge them through the same
      // id-keyed max) + a duplicated eval vector (rounded-cos tie -> the
      // HIGHER eval id must win on both paths)
      val corpus = (Seq.tabulate(50)(i =>
        (i.toLong, Array((i % 7).toFloat + 1f, (i % 3).toFloat))) :+
        (0L, Array(9.0f, 1.0f))).toDF("id", "vec")
      val evalSet = Seq(
        (100L, Array(3.0f, 1.0f)),
        (200L, Array(1.0f, 2.0f)),
        (300L, Array(3.0f, 1.0f)) // tie with 100 on every cosine
      ).toDF("id", "vec")
      val viaLiteral = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", 0.9)
        .orderBy("id").collect().toSeq
      val viaCross = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", 0.9, literalEvalRows = 0)
        .orderBy("id").collect().toSeq
      assert(viaLiteral === viaCross)
      // ties resolved upward on both paths
      assert(viaLiteral.forall(r => r.getLong(2) != 100L))
    }

    it("refuses an eval set past the broadcast bound with a readable error (r12 verdict 3)") {
      val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
      val evalSet = Seq.tabulate(10)(i =>
        (i.toLong, Array(1.0f, i.toFloat))).toDF("id", "vec")
      val ex = intercept[IllegalArgumentException] {
        Similarity.decontaminateByEmbedding(
          corpus, "id", "vec", evalSet, "id", "vec", 0.5, maxEvalRows = 5L)
      }
      assert(ex.getMessage.contains("decontaminateByEmbeddingCelled"))
    }

    def randVecs(n: Int, dim: Int, seed: Long, centers: Int): Seq[(Long, Array[Float])] = {
      val rnd = new scala.util.Random(seed)
      val cs = Array.fill(math.max(centers, 1), dim)(rnd.nextGaussian())
      Seq.tabulate(n) { i =>
        val c = cs(i % math.max(centers, 1))
        val v = Array.tabulate(dim)(d =>
          (c(d) + (if (centers > 0) 0.15 else 1.0) * rnd.nextGaussian()).toFloat)
        (i.toLong, v)
      }
    }

    it("celled variant is row-for-row identical to brute force on clustered eval sets") {
      val corpus = randVecs(120, 16, seed = 7L, centers = 5).toDF("id", "vec")
      val evalSet = randVecs(60, 16, seed = 11L, centers = 5)
        .map { case (i, v) => (1000L + i, v) }.toDF("id", "vec")
      val brute = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", 0.9)
        .orderBy("id").collect().toSeq
      val celled = Similarity.decontaminateByEmbeddingCelled(
        corpus, "id", "vec", evalSet, "id", "vec", 0.9, nCells = 4)
        .orderBy("id").collect().toSeq
      assert(celled === brute)
    }

    it("celled variant stays exact on isotropic (pruning-hostile) eval sets, ties included") {
      // centers = 0 -> pure gaussian noise: the triangle bounds barely
      // prune, which stresses the near-tie eps path rather than the happy
      // path; a duplicated eval vector checks the highest-id tie-break
      val corpus = randVecs(80, 8, seed = 3L, centers = 0).toDF("id", "vec")
      val base = randVecs(40, 8, seed = 5L, centers = 0)
      val evalSet = (base.map { case (i, v) => (2000L + i, v) } :+
        (9999L, base.head._2)).toDF("id", "vec")
      val brute = Similarity.decontaminateByEmbedding(
        corpus, "id", "vec", evalSet, "id", "vec", 0.3)
        .orderBy("id").collect().toSeq
      val celled = Similarity.decontaminateByEmbeddingCelled(
        corpus, "id", "vec", evalSet, "id", "vec", 0.3, nCells = 6)
        .orderBy("id").collect().toSeq
      assert(celled === brute)
    }
  }

  describe("Dedup.dedupParagraphs") {
    it("keeps first occurrences in order and drops later repeats") {
      val docs = Seq(
        (1L, "A\n\nB\n\nA\n\nC\n\nB"),
        (2L, "solo"),
        (3L, "X\n\n\n\nX\n\n") // doubled separators make empty paragraphs
      ).toDF("doc_id", "text")
      val out = Dedup.dedupParagraphs(docs, "doc_id", "text")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      assert(out === Seq(
        (1L, "A\n\nB\n\nC"),
        (2L, "solo"),
        (3L, "X\n\n"))) // X, "" survive once each, order kept
    }

    it("is partitioning-independent") {
      val docs = Seq.tabulate(50)(i => (i.toLong, s"P$i\n\nNAV\n\nP$i"))
        .toDF("doc_id", "text")
      val a = Dedup.dedupParagraphs(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val b = Dedup.dedupParagraphs(docs.repartition(7), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.head.getString(1) === "P0\n\nNAV")
    }
  }

  describe("Dedup.paragraphDupStats") {
    it("counts cross-document duplicates, once per doc, within-doc repeats ignored") {
      val docs = Seq(
        (1L, "P1\n\nSHARED"),
        (2L, "P2\n\nSHARED\n\nSHARED"), // in-doc repeat still counts once
        (3L, "P3")
      ).toDF("doc_id", "text")
      val out = Dedup.paragraphDupStats(docs, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      out shouldBe Seq(
        (1L, 2L, 1L, 0.5),
        (2L, 2L, 1L, 0.5), // distinct paras P2 + SHARED
        (3L, 1L, 0L, 0.0))
    }

    it("a paragraph shared only within ONE doc is not a corpus duplicate") {
      val docs = Seq((1L, "A\n\nA\n\nB"), (2L, "C")).toDF("doc_id", "text")
      val out = Dedup.paragraphDupStats(docs, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
      out shouldBe Seq((1L, 2L, 0L, 0.0), (2L, 1L, 0L, 0.0))
    }
  }

  describe("Dedup.selectCanonical") {
    it("keeps the highest-quality member per cluster, ties to the lowest id") {
      val clustered = Seq(
        (1L, 10L, 5L), (2L, 10L, 9L), (3L, 10L, 9L), // tie 2 vs 3 -> 2
        (4L, 4L, 1L) // singleton cluster
      ).toDF("doc_id", "cluster_id", "quality")
      val out = Dedup.selectCanonical(clustered, "doc_id", "cluster_id", col("quality"))
        .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
      out.map(r => r._1 -> r._4) shouldBe
        Seq(1L -> false, 2L -> true, 3L -> false, 4L -> true)
    }
  }

  describe("Chunking.contentDefinedChunks") {
    it("chunks tile the text exactly and hashes are reproducible") {
      val rnd = new scala.util.Random(7)
      val body = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val docs = Seq((1L, body)).toDF("doc_id", "text")
      val out = Chunking.contentDefinedChunks(docs, "doc_id", "text")
        .orderBy("chunk_idx")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      out.head._3 shouldBe 1L // first chunk starts at 1
      out.last._4 shouldBe (body.length + 1L) // last ends at n+1
      // consecutive: each chunk starts where the previous ended
      out.sliding(2).foreach { case Seq(a, b) => b._3 shouldBe a._4; case _ => }
      // re-running yields identical boundaries and hashes
      val again = Chunking.contentDefinedChunks(docs.repartition(3), "doc_id", "text")
        .orderBy("chunk_idx").as[(Long, Long, Long, Long, Long)].collect().toSeq
      again shouldBe out
    }

    it("boundaries resynchronize after an insertion (the CDC property)") {
      val rnd = new scala.util.Random(11)
      val body = (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val shifted = "INSERTED PREFIX " + body
      val docs = Seq((1L, body), (2L, shifted)).toDF("doc_id", "text")
      val byDoc = Chunking.contentDefinedChunks(docs, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long)].collect().groupBy(_._1)
      val h1 = byDoc(1L).map(_._5).toSet
      val h2 = byDoc(2L).map(_._5).toSet
      // all but the first chunk (which absorbed the insertion) survive:
      // fixed-offset chunking would shift EVERY chunk and share nothing
      val shared = h1.intersect(h2).size
      shared should be >= (h1.size - 2)
      shared should be >= 1
    }

    it("positions count CODEPOINTS, matching SQL substr semantics on multi-byte text") {
      // é is 2 UTF-8 bytes / 1 codepoint; 🎉 is 4 bytes / 1 codepoint (2
      // Java chars) — boundary positions and chunk tiling must be in
      // codepoints or the oracle's substr-based reconstruction diverges
      val uni = "héllo wörld 🎉 " * 40
      val docs = Seq((1L, uni)).toDF("doc_id", "text")
      val out = Chunking.contentDefinedChunks(docs, "doc_id", "text")
        .orderBy("chunk_idx").as[(Long, Long, Long, Long, Long)].collect().toSeq
      out.head._3 shouldBe 1L
      out.last._4 shouldBe (uni.codePointCount(0, uni.length) + 1L)
      out.sliding(2).foreach { case Seq(a, b) => b._3 shouldBe a._4; case _ => }
    }

    it("maxLen forces cuts on pathological low-entropy text; minLen suppresses tiny chunks") {
      // 1000 identical chars: the rolling hash is constant, so either EVERY
      // window position is a boundary (hash%64==0) or NONE is — both
      // pathologies need clamps. maxLen bounds the none-case; minLen bounds
      // the every-position case.
      val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
      val clamped = Chunking.contentDefinedChunks(docs, "doc_id", "text",
        minLen = 50, maxLen = 100)
        .orderBy("chunk_idx").as[(Long, Long, Long, Long, Long)].collect().toSeq
      clamped.head._3 shouldBe 1L
      clamped.last._4 shouldBe 1001L
      clamped.sliding(2).foreach { case Seq(a, b) => b._3 shouldBe a._4; case _ => }
      clamped.foreach { c =>
        (c._4 - c._3) should be <= 100L // no chunk beyond maxLen
      }
      clamped.init.foreach { c => (c._4 - c._3) should be >= 50L } // minLen (tail may be short)
      // default (clamps off) on the same text: whatever the hash decides,
      // the tiling invariants still hold and results are reproducible
      val open = Chunking.contentDefinedChunks(docs, "doc_id", "text")
        .orderBy("chunk_idx").as[(Long, Long, Long, Long, Long)].collect().toSeq
      open.head._3 shouldBe 1L
      open.last._4 shouldBe 1001L
    }

    it("empty and sub-window texts behave: zero chunks / one whole-text chunk") {
      val docs = Seq((1L, ""), (2L, "short")).toDF("doc_id", "text")
      val out = Chunking.contentDefinedChunks(docs, "doc_id", "text")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      out.map(_._1) shouldBe Seq(2L) // empty text yields nothing
      out.head._3 shouldBe 1L
      out.head._4 shouldBe 6L // "short".length + 1
    }
  }

  describe("TextFunctions code signals") {
    import graft.functions.TextFunctions
    it("flags code-like text on any of the three signals; prose passes") {
      val rows = Seq(
        (1L, "def f(x) {\n    return x + 1;\n}"), // punct + semis + indent
        (2L, "line one\n    indented two\n    indented three"), // indent only
        (3L, "plain prose here\nand some more of it"),
        (4L, "")
      ).toDF("doc_id", "text")
      val out = rows.select(col("doc_id"),
        TextFunctions.isCodeLike(col("text")).as("c"),
        TextFunctions.indentLineFrac(col("text")).as("ind"))
        .orderBy("doc_id").as[(Long, Boolean, Double)].collect().toSeq
      out.map(r => r._1 -> r._2).toMap shouldBe
        Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
      out(1)._3 shouldBe (2.0 / 3 +- 1e-3) // 2 of 3 non-empty lines indented
    }
  }

  describe("Curation.filterAblation") {
    it("counts every observed verdict combination once, nulls as unflagged") {
      val docs = Seq(
        (1L, Some(50), "en"), // short only
        (2L, Some(50), "de"), // short + non-en
        (3L, Some(500), "en"), // survivor
        (4L, Some(500), "en"), // survivor
        (5L, None, "de")) // null short-verdict -> false; non-en only
        .toDF("id", "n_chars", "lang")
      val out = Curation.filterAblation(docs, Seq(
        "f_short" -> (col("n_chars") < 200),
        "f_non_en" -> (col("lang") =!= "en")))
        .as[(Boolean, Boolean, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      out shouldBe Map(
        (true, false) -> ((1L, 1L)),
        (true, true) -> ((1L, 2L)),
        (false, false) -> ((2L, 0L)), // survivors
        (false, true) -> ((1L, 1L)))
    }

    it("rejects duplicate filter names") {
      an[IllegalArgumentException] should be thrownBy
        Curation.filterAblation(Seq((1L, 1)).toDF("id", "v"),
          Seq("f" -> (col("v") > 0), "f" -> (col("v") < 0)))
    }
  }
}
