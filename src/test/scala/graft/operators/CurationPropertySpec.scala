package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import scala.util.Random

import graft.SparkTestBase

/** Property-style checks for the curation normalizers: idempotence is THE
  * contract of canonicalization/dedup (applying twice must equal applying
  * once — otherwise incremental re-curation drifts), checked over randomly
  * generated messy inputs rather than unit examples. Deterministic seed. */
class CurationPropertySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private val rnd = new Random(23)

  it("canonicalizeUrl is idempotent over randomly messy URLs") {
    def messyUrl(): String = {
      val scheme = Seq("http", "HTTP", "https", "HTTPS")(rnd.nextInt(4))
      val www = Seq("", "www.", "WWW.")(rnd.nextInt(3))
      val host = Seq("Site.COM", "a.b.Example.org", "news.example.co.uk",
        "localhost")(rnd.nextInt(4))
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/", "/A/b", "/a/b/", "/x//")(rnd.nextInt(5))
      val params = Random.shuffle(Seq(
        Some("id=" + rnd.nextInt(100)), Some("utm_source=x"),
        Some("gclid=abc"), Some("keep=1"), Some("ref=r"), None, None))
        .flatten.take(rnd.nextInt(4))
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = Seq("", "#f", "#sec:2")(rnd.nextInt(3))
      s"$scheme://$www$host$port$path$query$frag"
    }
    val urls = (1 to 300).map(_ => messyUrl())
    val once = urls.toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    val twice = once.toSeq.toDF("u")
      .select(Urls.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    twice.toSeq shouldBe once.toSeq
    // canonical forms never carry fragments, scheme-DEFAULT ports (https
    // :443 / http :80 — :443 on an http URL is non-default and survives)
    // or www hosts
    once.foreach { c =>
      c should not include "#"
      c should not include "://www."
      if (c.startsWith("https:")) ":443([/?]|$)".r.findFirstIn(c) shouldBe None
      if (c.startsWith("http:")) ":80([/?]|$)".r.findFirstIn(c) shouldBe None
    }
  }

  it("dedupParagraphs is idempotent and never grows a document") {
    val paras = Vector("alpha", "beta", "gamma delta", "", "NAV bar")
    val docs = (1L to 100L).map { i =>
      val k = 1 + rnd.nextInt(8)
      i -> Seq.fill(k)(paras(rnd.nextInt(paras.size))).mkString("\n\n")
    }
    val df = docs.toDF("id", "text")
    val once = Dedup.dedupParagraphs(df, "id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val twice = Dedup.dedupParagraphs(once.toDF("id", "text"), "id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    twice shouldBe once
    val in = docs.toMap
    once.foreach { case (id, text) =>
      text.length should be <= in(id).length
      // survivors appear in first-occurrence order of the input
      val inParas = in(id).split("\n\n", -1).toSeq
      val outParas = text.split("\n\n", -1).toSeq
      outParas shouldBe inParas.distinct
    }
  }

  it("corpusOverlap estimates stay in [0,1], symmetric under group relabeling") {
    val words = Vector("spark", "shuffle", "parquet", "join", "scan", "batch",
      "row", "column", "merge", "sort", "agg", "window")
    def doc() = (1 to 20).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val docs = (1 to 120).map(i => (s"s${i % 4}", doc())).toDF("src", "text")
    val est = Dedup.corpusOverlap(docs, "src", "text")
      .as[(String, String, Double)].collect()
    est.length shouldBe 6 // 4 choose 2
    est.foreach { case (_, _, j) =>
      j should be >= 0.0
      j should be <= 1.0
    }
    // relabeling groups (swap names) permutes rows but keeps estimates:
    // the signature depends only on the member set
    val swapped = docs.withColumn("src",
      when(col("src") === "s0", "zz").otherwise(col("src")))
    val est2 = Dedup.corpusOverlap(swapped, "src", "text")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) =>
        val (x, y) = (if (a == "zz") "s0" else a, if (b == "zz") "s0" else b)
        (Seq(x, y).min, Seq(x, y).max, j)
      }.sortBy(r => (r._1, r._2))
    est2.toSeq shouldBe est.sortBy(r => (r._1, r._2)).toSeq
  }

  it("paragraphDupStats is partition-independent and ratio-bounded") {
    val paras = Vector("alpha beta", "NAV shared", "gamma", "delta eps", "NAV other")
    def doc() = (1 to (1 + rnd.nextInt(4)))
      .map(_ => paras(rnd.nextInt(paras.size))).mkString("\n\n")
    val docs = (1L to 80L).map(i => (i, doc())).toDF("doc_id", "text")
    val a = Dedup.paragraphDupStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.paragraphDupStats(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    a shouldBe b
    a.foreach { r =>
      r.getDouble(3) should be >= 0.0
      r.getDouble(3) should be <= 1.0
      r.getLong(2) should be <= r.getLong(1) // dups <= paras
    }
  }

  it("calibrateWithinGroup is partition-independent and spans [0,1] per group") {
    val docs = (1L to 100L).map(i => (i, s"g${i % 3}", rnd.nextInt(20).toLong))
      .toDF("id", "grp", "score")
    val a = Ranking.calibrateWithinGroup(docs, Seq("grp"), col("score"), col("id"))
      .orderBy("id").collect().toSeq
    val b = Ranking.calibrateWithinGroup(docs.repartition(5), Seq("grp"),
      col("score"), col("id")).orderBy("id").collect().toSeq
    a shouldBe b
    // each group's calibrated scores cover exactly [0, 1]
    val byGroup = a.groupBy(_.getString(1))
    byGroup.values.foreach { rows =>
      val c = rows.map(_.getDouble(3))
      c.min shouldBe 0.0
      c.max shouldBe 1.0
    }
  }
}
