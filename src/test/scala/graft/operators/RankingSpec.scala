package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.functions.TextFunctions

class RankingSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("bm25") {
    val docs = Seq(
      (0L, "spark shuffle join join join"),
      (1L, "spark spark spark spark spark"),
      (2L, "window filter scan table row"),
      (3L, "the quick brown fox jumps")).toDF("doc_id", "text")

    it("scores term-bearing docs above term-free docs") {
      val scored = Ranking.bm25(docs, "doc_id", "text", Seq("join"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      scored(0L) should be > 0.0
      scored(1L) shouldBe 0.0
      scored(3L) shouldBe 0.0
    }

    it("saturates in tf: 5 repeats score less than 5x a single occurrence") {
      val d = Seq((0L, "spark a b c d"), (1L, "spark spark spark spark spark"))
        .toDF("doc_id", "text")
      val scored = Ranking.bm25(d, "doc_id", "text", Seq("spark"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      scored(1L) should be > scored(0L)
      scored(1L) should be < scored(0L) * 5
    }

    it("rewards rarer terms: lower df means higher idf weight") {
      // "rare" df=1, "common" df=3; equal tf and equal doc length
      val d = Seq(
        (0L, "rare x"), (1L, "common x"),
        (2L, "common y"), (3L, "common z")).toDF("doc_id", "text")
      val scored = Ranking.bm25(d, "doc_id", "text", Seq("rare", "common"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      scored(0L) should be > scored(1L)
    }

    it("is a pure map job after one bounded stats pass (no shuffle in the scoring plan)") {
      val plan = Ranking.bm25(docs, "doc_id", "text", Seq("spark"))
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }

  describe("bm25TopK") {
    val docs = Seq(
      (0L, "spark shuffle join join join"),
      (1L, "spark spark spark spark spark"),
      (2L, "window filter scan table row"),
      (3L, "the quick brown fox jumps")).toDF("doc_id", "text")

    // independent replay of the retrieval arithmetic (idf round-6, per-term
    // contribution round-6 as integer micro-units, order-free sum)
    def replay(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
        k: Int): Seq[(Long, Long, Long, Double)] = {
      def round6(v: Double): Double =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val n = toks.size
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
      val dfm = toks.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
      (for {
        (qid, qtext) <- queries
        qterms = qtext.split("\\s+").filter(_.nonEmpty).distinct.toSeq
        scored = toks.collect { case (did, ts) if qterms.exists(ts.contains) =>
          val s = qterms.flatMap { term =>
            val tf = ts.count(_ == term).toDouble
            if (tf == 0) None else {
              val idf = round6(math.log((n - dfm(term) + 0.5) / (dfm(term) + 0.5) + 1.0))
              Some(math.round(round6(idf * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * (ts.size / avgdl)))) * 1e6))
            }
          }.sum
          (did, s)
        }
        ((did, si), i) <- scored.sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
      } yield (qid, (i + 1).toLong, did, si.toDouble / 1e6)).sortBy(r => (r._1, r._2))
    }

    it("matches an independent replay and never scores term-free docs") {
      val qs = Seq((1L, "spark join"), (2L, "window")).toDF("query_id", "qtext")
      val got = Ranking.bm25TopK(docs, "doc_id", "text", qs, "query_id", "qtext", k = 3)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      val want = replay(
        Seq((0L, "spark shuffle join join join"), (1L, "spark spark spark spark spark"),
          (2L, "window filter scan table row"), (3L, "the quick brown fox jumps")),
        Seq((1L, "spark join"), (2L, "window")), k = 3)
      got shouldBe want
      // inverted-index property: doc 3 shares no term with either query
      got.map(_._3) should not contain 3L
      // query 2 retrieves exactly the one window-bearing doc
      got.filter(_._1 == 2L).map(_._3) shouldBe Seq(2L)
    }

    it("is deterministic under repartitioning and caps at k") {
      val corpus = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      val qs = Seq((7L, "spark window join")).toDF("query_id", "qtext")
      val a = Ranking.bm25TopK(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      val b = Ranking.bm25TopK(corpus.repartition(11), "doc_id", "text",
          qs, "query_id", "qtext", k = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      a shouldBe b
      a.size shouldBe 4
      a.map(_._2) shouldBe Seq(1L, 2L, 3L, 4L)
      // scores non-increasing down the ranking
      a.map(_._4).sliding(2).foreach { case Seq(x, y) => x should be >= y }
    }

    it("repeated query terms count once") {
      val q1 = Seq((1L, "spark")).toDF("query_id", "qtext")
      val q2 = Seq((1L, "spark spark spark")).toDF("query_id", "qtext")
      val a = Ranking.bm25TopK(docs, "doc_id", "text", q1, "query_id", "qtext", k = 5)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      val b = Ranking.bm25TopK(docs, "doc_id", "text", q2, "query_id", "qtext", k = 5)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      a shouldBe b
    }

    it("maxDfFraction below any term's df is a bit-exact no-op") {
      // docs: "spark" df=2/4=0.5, "join" 1/4, "window" 1/4 — a 0.6 cap
      // prunes nothing, so results must be IDENTICAL to the uncapped run
      val qs = Seq((1L, "spark join"), (2L, "window")).toDF("query_id", "qtext")
      val uncapped = Ranking.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 3).as[(Long, Long, Long, Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val capped = Ranking.bm25TopK(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 3, maxDfFraction = 0.6)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      capped shouldBe uncapped
    }

    it("a pruned hot term scores exactly as if absent from the query text") {
      // make "the" hot: present in every doc (df = 4/4 = 1.0)
      val hotDocs = Seq(
        (0L, "the spark shuffle join join join"),
        (1L, "the spark spark spark spark spark"),
        (2L, "the window filter scan table row"),
        (3L, "the quick brown fox jumps")).toDF("doc_id", "text")
      val withHot = Seq((1L, "the spark join")).toDF("query_id", "qtext")
      val without = Seq((1L, "spark join")).toDF("query_id", "qtext")
      val capped = Ranking.bm25TopK(hotDocs, "doc_id", "text", withHot,
        "query_id", "qtext", k = 4, maxDfFraction = 0.9)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      val dropped = Ranking.bm25TopK(hotDocs, "doc_id", "text", without,
        "query_id", "qtext", k = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      capped shouldBe dropped
      // the uncapped run DOES differ (the hot term reaches every doc):
      // doc 3 shares only "the" with the query, so it appears uncapped
      // and vanishes under the cap
      val uncapped = Ranking.bm25TopK(hotDocs, "doc_id", "text", withHot,
        "query_id", "qtext", k = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
      uncapped.map(_._3) should contain(3L)
      capped.map(_._3) should not contain 3L
    }

    it("a query whose terms are ALL pruned returns no rows for that query") {
      val hotDocs = Seq(
        (0L, "the spark"), (1L, "the join"), (2L, "the scan")).toDF("doc_id", "text")
      val qs = Seq((1L, "the"), (2L, "spark")).toDF("query_id", "qtext")
      val got = Ranking.bm25TopK(hotDocs, "doc_id", "text", qs,
        "query_id", "qtext", k = 3, maxDfFraction = 0.5)
        .as[(Long, Long, Long, Double)].collect().toSeq
      got.map(_._1).distinct shouldBe Seq(2L)
    }
  }

  describe("tfIdfTopTerms") {
    val docs = Seq(
      (0L, "apple apple apple banana"),
      (1L, "banana cherry cherry"),
      (2L, "apple banana cherry date")).toDF("doc_id", "text")

    it("ranks frequent-and-rare terms first, ties broken by term asc") {
      val out = Ranking.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
        .as[(Long, String, Long, Long, Double, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._6).map(r => (r._2, r._3, r._4))).toMap
      // doc 0: apple tf=3 df=2 beats banana tf=1 df=3
      out(0L) shouldBe Array(("apple", 3L, 2L), ("banana", 1L, 3L))
      // doc 1: cherry tf=2 df=2 first; banana second
      out(1L) shouldBe Array(("cherry", 2L, 2L), ("banana", 1L, 3L))
      // doc 2: date tf=1 df=1 has max idf; then apple/cherry tie on
      // (tf=1, df=2) -> term asc puts apple ahead
      out(2L) shouldBe Array(("date", 1L, 1L), ("apple", 1L, 2L))
    }

    it("scores monotonically: higher tf and lower df never score lower") {
      val all = Ranking.tfIdfTopTerms(docs, "doc_id", "text", topK = 100)
        .as[(Long, String, Long, Long, Double, Long)].collect()
      all.foreach { case (_, _, tf, df, score, _) =>
        score shouldBe (tf * math.round(math.log(3.0 / df) * 1e6) / 1e6 +- 1e-6)
      }
      // df=3 terms (present everywhere) have idf 0 -> score 0
      all.filter(_._4 == 3L).foreach(_._5 shouldBe 0.0)
    }

    it("drops empty documents rather than erroring") {
      val d = Seq((0L, ""), (1L, "word")).toDF("doc_id", "text")
      val out = Ranking.tfIdfTopTerms(d, "doc_id", "text", topK = 3)
        .select("doc_id").as[Long].collect()
      out shouldBe Array(1L)
    }
  }

  describe("unigramSurprisal") {
    it("scores common-token docs low and rare-token docs high") {
      // "the" dominates the corpus; doc 3 is all rare tokens
      val d = Seq(
        (1L, "the the the the the the the the"),
        (2L, "the the the cat"),
        (3L, "zyx qwv pqr"),
        (4L, "")).toDF("doc_id", "text")
      val out = Ranking.unigramSurprisal(d, "doc_id", "text")
        .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
      out.map(_._2) shouldBe Array(8L, 4L, 3L, 0L)
      val score = out.map(r => r._1 -> r._3).toMap
      score(4L) shouldBe None // token-less doc: null score, kept
      score(1L).get should be < score(2L).get
      score(2L).get should be < score(3L).get
      // exact value: doc 1 is pure "the", p = 11/15
      score(1L).get shouldBe
        BigDecimal(-math.log(11.0 / 15.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }

    it("is case-insensitive and keeps every doc once") {
      val d = Seq((1L, "The THE the"), (2L, "foo")).toDF("doc_id", "text")
      val out = Ranking.unigramSurprisal(d, "doc_id", "text")
      out.count() shouldBe 2
      // all three "the" variants collapse to one token with c=3
      out.where(col("doc_id") === 1L).select("avg_surprisal").as[Double].head() shouldBe
        BigDecimal(-math.log(3.0 / 4.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
  }

  describe("bigramSurprisal") {
    it("matches the hand-computed add-1 model and sentinels short docs") {
      // corpus bigrams: (a,b)x3, (b,a)x1; V=3 (a, b and doc 3's lone x)
      // P(b|a) = (3+1)/(3+3) = 2/3; P(a|b) = (1+1)/(1+3) = 1/2
      val d = Seq(
        (1L, "a b a b"),
        (2L, "a b"),
        (3L, "x"),
        (4L, "")).toDF("doc_id", "text")
      val out = Ranking.bigramSurprisal(d, "doc_id", "text")
        .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
      out.map(_._2) shouldBe Array(3L, 1L, 0L, 0L)
      val score = out.map(r => r._1 -> r._3).toMap
      score(3L) shouldBe None // 1 token: no bigrams
      score(4L) shouldBe None
      val pBA = -math.log(2.0 / 3.0); val pAB = -math.log(0.5)
      score(1L).get shouldBe
        BigDecimal((pBA + pAB + pBA) / 3).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      score(2L).get shouldBe
        BigDecimal(pBA).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      // glued pairs score lower than unseen-context pairs would: doc 1's
      // repeated (a,b) is the corpus's dominant transition
      score(1L).get should be > score(2L).get // (b,a) is rarer than (a,b)
    }

    it("joins per-doc PROFILES, never the token-instance stream") {
      // the scale pin for the fused formulation: no arrays_zip instance
      // explode anywhere, and no BroadcastExchange feeding the LM into a
      // corpus-instance join — the only broadcast is the 1-row vocab scalar
      val d = Seq((1L, "a b c a b"), (2L, "b c d")).toDF("doc_id", "text")
      val out = Ranking.bigramSurprisal(d, "doc_id", "text")
      val plan = out.queryExecution.optimizedPlan.toString()
      plan shouldNot include("arrays_zip")
      // and the result is still exact
      out.count() shouldBe 2
    }
  }

  describe("dsirLogWeights") {
    val docs = Seq(
      (0L, true, "clean prose clean prose clean"),
      (1L, true, "clean prose thoughtful writing"),
      (2L, false, "spam junk spam junk spam junk"),
      (3L, false, "clean junk"), // mixed
      (4L, false, "")).toDF("doc_id", "tgt", "text")

    it("orders docs by target-profile affinity, zero for empty") {
      // absolute signs are smoothing-dependent (on a 9-token target slice
      // the +1-per-bucket prior dominates), so assert the invariant that
      // survives any smoothing strength: pure-target > mixed > off-target
      val w = Ranking.dsirLogWeights(docs, "doc_id", "text", col("tgt"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
      w(0L)._3 should be > w(3L)._3 // pure target above mixed
      w(3L)._3 should be > w(2L)._3 // mixed above pure off-target
      w(4L)._2 shouldBe 0L
      w(4L)._3 shouldBe 0.0
    }

    it("counts tokens per doc") {
      val w = Ranking.dsirLogWeights(docs, "doc_id", "text", col("tgt"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
      w(0L) shouldBe 5L
      w(3L) shouldBe 2L
    }
  }

  describe("calibrateWithinGroup") {
    it("maps scores to per-group percent ranks; singleton groups pin to 0") {
      val d = Seq(
        (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L),
        (4L, "b", 999L)).toDF("id", "grp", "score")
      val out = Ranking.calibrateWithinGroup(d, Seq("grp"), col("score"), col("id"))
        .orderBy("id").as[(Long, String, Long, Double)].collect().toSeq
      out.map(_._4) shouldBe Seq(0.0, 1.0, 0.5, 0.0)
    }

    it("breaks score ties deterministically by the tie-break column") {
      val d = Seq((1L, "a", 7L), (2L, "a", 7L), (3L, "a", 7L))
        .toDF("id", "grp", "score")
      val out = Ranking.calibrateWithinGroup(d, Seq("grp"), col("score"), col("id"))
        .orderBy("id").as[(Long, String, Long, Double)].collect().toSeq
      out.map(_._4) shouldBe Seq(0.0, 0.5, 1.0)
    }
  }

  describe("collocations") {
    it("surfaces glued pairs above independent ones; minCount prunes noise") {
      // "new york" always adjacent and exclusive; "and" is frequent
      // elsewhere, so "and cat" has the same pair count but lower PMI
      val docs = (1 to 30).map(i =>
        (i.toLong, s"new york trip and more and cat then dog end $i")).toDF("id", "text")
      val out = Ranking.collocations(docs, "text", minCount = 5L, topK = 10)
        .as[(String, String, Long, Double, Long)].collect()
      val byPair = out.map(r => (r._1, r._2) -> r._4).toMap
      byPair should contain key ("new" -> "york")
      // "new york" (always glued, both tokens rare) outranks "and cat"
      byPair(("new", "york")) should be > byPair(("and", "cat"))
      // rare pairs (the unique "$i and" bridges) pruned by minCount
      out.foreach(_._3 should be >= 5L)
      // ranks are 1..k dense and ordered by rounded pmi
      out.map(_._5).sorted shouldBe (1L to out.length).toArray
    }

    it("single-token and empty docs contribute no pairs") {
      val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b a b a b a b a b"))
        .toDF("id", "text")
      val out = Ranking.collocations(docs, "text", minCount = 2L, topK = 10)
        .as[(String, String, Long, Double, Long)].collect()
      out.map(r => (r._1, r._2)).toSet shouldBe Set("a" -> "b", "b" -> "a")
    }
  }

  describe("tokenEntropy") {
    it("uniform tokens maximize entropy; repeats lower it; empty is zero") {
      val d = Seq(
        (1L, "a b c d"),            // uniform over 4: ln 4
        (2L, "a a a b"),            // skewed: lower
        (3L, "x x x x"),            // constant: 0
        (4L, "  ")                  // empty: 0
      ).toDF("doc_id", "text")
      val out = d.select(col("doc_id"),
        TextFunctions.tokenEntropy(col("text")).as("h"))
        .as[(Long, Double)].collect().toMap
      out(1L) shouldBe BigDecimal(math.log(4))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      out(2L) should be < out(1L)
      out(2L) should be > 0.0
      out(3L) shouldBe 0.0
      out(4L) shouldBe 0.0
    }
  }

  describe("repetition signals") {
    it("flags fully repetitive text and passes diverse text") {
      val d = Seq(
        (0L, "spam spam spam spam"),
        (1L, "all these tokens differ here")).toDF("doc_id", "text")
      val out = d.select(
        col("doc_id"),
        TextFunctions.distinctTokenRatio(col("text")).as("dr"),
        TextFunctions.topTokenFrac(col("text")).as("tt"),
        TextFunctions.topBigramFrac(col("text")).as("tb"))
        .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
      out(0L)._2 shouldBe 0.25 // 1 distinct / 4
      out(0L)._3 shouldBe 1.0
      out(0L)._4 shouldBe 1.0 // "spam spam" x3
      out(1L)._2 shouldBe 1.0
      out(1L)._3 shouldBe 0.2
      out(1L)._4 shouldBe 0.25 // 4 distinct bigrams of 4
    }

    it("handles empty and single-token docs without dividing by zero") {
      val d = Seq((0L, ""), (1L, "solo")).toDF("doc_id", "text")
      val out = d.select(
        col("doc_id"),
        TextFunctions.distinctTokenRatio(col("text")).as("dr"),
        TextFunctions.topTokenFrac(col("text")).as("tt"),
        TextFunctions.topBigramFrac(col("text")).as("tb"))
        .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
      out(0L)._2 shouldBe 0.0
      out(0L)._3 shouldBe 0.0
      out(1L)._2 shouldBe 1.0
      out(1L)._3 shouldBe 1.0
    }
  }

  describe("reciprocal-rank fusion") {
    it("fuses ranked lists with exact integer micro-units") {
      // doc 10 ranks 1st lexically and 3rd in vectors; doc 20 ranks 1st in
      // vectors only; doc 30 appears in both mid-list
      val lexical = Seq((10L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rank")
      val vector = Seq((20L, 1L), (30L, 2L), (10L, 3L)).toDF("doc_id", "rank")
      val out = Ranking.rrfFuse(Seq(lexical, vector), "doc_id", "rank", topK = 4)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      def u(r: Long) = math.round(1e9 / (60 + r))
      // exact unit sums: both-list docs beat single-list docs, and
      // {1st, 3rd} (32266459) edges out {2nd, 2nd} (32258064)
      out.map(r => (r._2, r._3, r._4)) shouldBe Array(
        (10L, u(1) + u(3), 2L),
        (30L, u(2) + u(2), 2L),
        (20L, u(1), 1L),
        (40L, u(3), 1L))
      out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L) // ranks dense from 1
    }

    it("fuses non-numeric (string/UUID) doc ids — no long cast in the id path") {
      val lexical = Seq(("doc-aa", 1L), ("doc-bb", 2L)).toDF("doc_id", "rank")
      val vector = Seq(("doc-bb", 1L), ("doc-cc", 2L)).toDF("doc_id", "rank")
      val out = Ranking.rrfFuse(Seq(lexical, vector), "doc_id", "rank", topK = 3)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1)
      def u(r: Long) = math.round(1e9 / (60 + r))
      out.map(r => (r._2, r._3, r._4)) shouldBe Array(
        ("doc-bb", u(2) + u(1), 2L), // both lists wins
        ("doc-aa", u(1), 1L),
        ("doc-cc", u(2), 1L))
    }

    it("nDCG@k is 1.0 for the ideal ranking, lower when graded docs sink") {
      // query 1: docs 100 (rel 3), 200 (rel 1), 300 (rel 0 / unjudged)
      val qrels = Seq((1L, 100L, 3L), (1L, 200L, 1L), (2L, 500L, 0L))
        .toDF("query_id", "doc_id", "rel")
      val ideal = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 300L, 3L))
        .toDF("query_id", "doc_id", "rank")
      val idealOut = Ranking.ndcgAtK(ideal, qrels, k = 3)
        .as[(Long, Long, Long, Option[Double])].collect().head
      idealOut._4 shouldBe Some(1.0)
      idealOut._2 shouldBe idealOut._3 // DCG == IDCG, exact units
      // the reversed ranking discounts the rel-3 doc at rank 3
      val reversed = Seq((1L, 300L, 1L), (1L, 200L, 2L), (1L, 100L, 3L))
        .toDF("query_id", "doc_id", "rank")
      val revOut = Ranking.ndcgAtK(reversed, qrels, k = 3)
        .as[(Long, Long, Long, Option[Double])].collect().head
      revOut._4.get should be < 1.0
      revOut._4.get should be > 0.0
      // exact unit arithmetic: DCG = 1*630929754 + 7*500000000,
      // IDCG = 7*1000000000 + 1*630929754
      revOut._2 shouldBe (630929754L + 7L * 500000000L)
      revOut._3 shouldBe (7L * 1000000000L + 630929754L)
      // a query with no positive judgments reports null ndcg
      val q2 = Seq((2L, 500L, 1L)).toDF("query_id", "doc_id", "rank")
      val q2Out = Ranking.ndcgAtK(q2, qrels, k = 3)
        .as[(Long, Long, Long, Option[Double])].collect().head
      q2Out._3 shouldBe 0L
      q2Out._4 shouldBe None
    }

    it("precision/recall@k count hits exactly; zero-judgment queries report null recall") {
      val qrels = Seq((1L, 100L, 3L), (1L, 200L, 1L), (1L, 300L, 0L),
        (2L, 900L, 2L)).toDF("query_id", "doc_id", "rel")
      // query 1 retrieves one relevant (100), one rel-0 (300), one unjudged
      // (999) in its top-3; query 3 has NO judgments at all
      val results = Seq(
        (1L, 100L, 1L), (1L, 300L, 2L), (1L, 999L, 3L), (1L, 200L, 4L),
        (3L, 100L, 1L)).toDF("query_id", "doc_id", "rank")
      val out = Ranking.precisionRecallAtK(results, qrels, k = 3)
        .as[(Long, Long, Long, Double, Option[Double])]
        .collect().map(r => r._1 -> r).toMap
      // rank 4 (doc 200, relevant) falls outside k=3
      out(1L) shouldBe ((1L, 1L, 2L, 0.333333, Some(0.5)))
      out(3L) shouldBe ((3L, 0L, 0L, 0.0, None))
    }

    it("breaks unit ties by doc id and respects topK") {
      val a = Seq((5L, 1L), (3L, 2L)).toDF("doc_id", "rank")
      val b = Seq((3L, 1L), (5L, 2L)).toDF("doc_id", "rank")
      // both docs share the same unit sum u(1)+u(2): rank order = id asc
      val out = Ranking.rrfFuse(Seq(a, b), "doc_id", "rank", topK = 1)
        .as[(Long, Long, Long, Long)].collect()
      out.length shouldBe 1
      out.head._2 shouldBe 3L
    }
  }
}
