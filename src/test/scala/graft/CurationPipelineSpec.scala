package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.dataflow.spark.{Graft => G}
import graft.dataflow.spark.actions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Packing, Sampling}

/** End-to-end training-data curation through the flow framework: the
  * pipeline a user of the reference would actually assemble — sources,
  * parallel-schedulable transforms and sinks declared as one DAG — with
  * the beyond-parity operators doing the curation work at each stage.
  * Quality filter → benchmark decontamination → near-dup removal →
  * per-language caps → sequence packing → parquet. */
class CurationPipelineSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  it("curates a corpus end-to-end as one scheduled flow") {
    val out = s"$tmpDir/curated"
    val flow = G.sparkFlow(spark)
      .openFileParquet(s"${sf()}/documents.parquet", "raw")
      // stage 1: drop degenerate docs (relaxed Gopher bounds — the synthetic
      // corpus is short-doc-heavy)
      .transform("raw")("filtered") { docs =>
        docs.where(TextFunctions.gopherPass(col("text"),
          minWords = 5L, minStopwords = 1L, minAlphaFrac = 0.5))
      }
      // stage 2: flag + drop docs overlapping the "benchmark" (docs 0-4)
      .transform("filtered")("clean") { docs =>
        val flags = Dedup.decontaminate(docs, "doc_id", "text",
          docs.where(col("doc_id") < 5), "text", n = 3)
        docs.join(flags.where(!col("contaminated")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
      // stage 3: near-dup removal (keep one doc per cluster)
      .transform("clean")("deduped") { docs =>
        Dedup.dedupCorpus(docs, "doc_id", "text",
          blockCols = Seq(col("lang"), floor(col("n_chars") / lit(50))),
          n = 3, threshold = 0.7)
      }
      // stage 4: cap docs per language (deterministic survivors)
      .transform("deduped")("capped") { docs =>
        Sampling.cappedPerKey(docs, Seq(col("lang")), col("doc_id"), maxPerKey = 50)
      }
      // stage 5: pack per-language token streams into 512-token windows
      .transform("capped")("packed") { docs =>
        Packing.packSequences(docs.select(col("doc_id"), col("lang"), col("text")),
          Seq(col("lang")), col("doc_id"),
          TextFunctions.tokenCount(col("text")), windowTokens = 512L)
      }
      .writeParquet(out)("packed")

    flow.isValidFlowDAG.isSuccess shouldBe true
    G.sparkExecutor(maxParallelActions = 4).execute(flow)

    val packed = spark.read.parquet(s"$out/packed")
    val nRaw = spark.read.parquet(s"${sf()}/documents.parquet").count()
    packed.count() should be > 0L
    packed.count() should be < nRaw // every stage actually dropped something

    // benchmark docs and their contaminated neighbours are gone
    packed.where(col("doc_id") < 5).count() shouldBe 0L

    // per-language caps hold
    packed.groupBy("lang").count().select("count").as[Long].collect()
      .foreach(_ should be <= 50L)

    // packing invariants: offsets gapless per lang, chunks start at 0
    val byLang = packed.select("lang", "start_offset", "n_tokens")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.head._2 shouldBe 0L
      sorted.sliding(2).foreach {
        case Array(a, b) => b._2 shouldBe a._2 + a._3
        case _ =>
      }
    }
  }

  it("curates web-ish HTML with drift monitoring, semantic dedup and splits") {
    import graft.operators.{Drift, Sampling, Similarity}
    val out = s"$tmpDir/curated2"
    val flow = G.sparkFlow(spark)
      .openFileParquet(s"${sf()}/documents.parquet", "raw")
      .openFileParquet(s"${sf()}/embeddings.parquet", "embeddings")
      // stage 1: pretend the corpus arrived as markup — extract text
      .transform("raw")("extracted") { docs =>
        docs.withColumn("text", TextFunctions.stripHtml(
          concat(lit("<p>"), col("text"), lit("</p><!-- crawl -->"))))
      }
      // stage 2: drift gate vs the previous snapshot (here: the en slice) —
      // a real pipeline would alert when js exceeds a budget
      .transform("extracted")("drift") { docs =>
        Drift.tokenDrift(docs.where(col("lang") === "en"),
          docs.where(col("lang") =!= "en"), "text")
      }
      // stage 3: semantic dedup on the embedding table, join survivors
      .transform("embeddings")("kept_vectors") { emb =>
        Similarity.semDedup(emb, "vec_id", "embedding",
          threshold = 0.3, nCells = 4)
          .where(col("keep")).select(col("vec_id").as("doc_id"))
      }
      .transform("extracted", "kept_vectors")("deduped") { (docs, kept) =>
        docs.join(kept, Seq("doc_id"), "left_semi")
      }
      // stage 4: leak-free train/val/test assignment
      .transform("deduped")("split") { docs =>
        Sampling.splitByHash(docs, col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      }
      .writeParquet(out)("split", "drift")

    flow.isValidFlowDAG.isSuccess shouldBe true
    G.sparkExecutor(maxParallelActions = 4).execute(flow)

    val split = spark.read.parquet(s"$out/split")
    val drift = spark.read.parquet(s"$out/drift")
    drift.count() shouldBe 1L
    drift.select("js").as[Double].head() should be > 0.0 // en vs rest differ
    split.count() should be > 0L
    split.select("split").distinct().as[String].collect().toSet shouldBe
      Set("train", "val", "test")
    // entity extraction really ran: no markup survives
    split.where(col("text").contains("<p>")).count() shouldBe 0L
  }

  it("curates a URL-keyed crawl: canonicalize, paragraph-dedup, decontaminate, export shards") {
    import graft.operators.{Export, Urls}
    val out = s"$tmpDir/curated3"
    val flow = G.sparkFlow(spark)
      .openFileParquet(s"${sf()}/documents.parquet", "raw")
      // stage 1: synthesize the crawl shape — messy per-doc URLs and docs
      // whose pages repeat their own lead block
      .transform("raw")("crawl") { docs =>
        docs
          .withColumn("url", concat(lit("HTTPS://WWW."), col("source"),
            lit(".Example.com/p/"), col("doc_id"), lit("/?utm_source=x&id="),
            col("doc_id"), lit("#top")))
          .withColumn("text", concat_ws("\n\n",
            substring(col("text"), 1, 50), col("text"),
            substring(col("text"), 1, 50)))
      }
      // stage 2: URL-level dedup key — canonical URL + registrable domain
      .transform("crawl")("url_keyed") { docs =>
        docs.select(col("doc_id"), col("lang"),
          Urls.canonicalizeUrl(col("url")).as("url"),
          Urls.registrableDomain(col("url")).as("domain"), col("text"))
          .dropDuplicates("url")
      }
      // stage 3: strip each page's internal repeats
      .transform("url_keyed")("para_deduped") { docs =>
        Dedup.dedupParagraphs(docs.select(col("doc_id"), col("text")), "doc_id", "text")
          .join(docs.drop("text"), Seq("doc_id"))
      }
      // stage 4: drop docs overlapping the benchmark (docs 0-4)
      .transform("para_deduped")("clean") { docs =>
        val flags = Dedup.decontaminate(docs, "doc_id", "text",
          docs.where(col("doc_id") < 5), "text", n = 3)
        docs.join(flags.where(!col("contaminated")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
      // stage 5: ship as deterministic shards + manifest
      .transform("clean")("manifest") { docs =>
        Export.writeShards(docs, col("doc_id"), s"$out/shards", docsPerShard = 100L)
      }
      .writeParquet(out)("manifest")

    flow.isValidFlowDAG.isSuccess shouldBe true
    G.sparkExecutor(maxParallelActions = 4).execute(flow)

    val manifest = spark.read.parquet(s"$out/manifest")
    val shards = spark.read.parquet(s"$out/shards")
    // canonicalization ran: no tracking params, fragments, or www survive
    // (the shards carry the url column through)
    shards.where(col("url").contains("utm_") || col("url").contains("#") ||
      col("url").contains("://www.")).count() shouldBe 0L
    shards.where(col("domain") =!= "example.com").count() shouldBe 0L
    // paragraph dedup ran: the duplicated lead block collapsed
    shards.selectExpr("min(size(split(text, '\\n\\n')))").as[Int].head() should be <= 2
    // benchmark docs gone
    shards.where(col("doc_id") < 5).count() shouldBe 0L
    // manifest agrees with what landed on disk
    manifest.agg(sum("n_docs")).as[Long].head() shouldBe shards.count()
    manifest.count() shouldBe shards.select("shard").distinct().count()
  }

  it("enriches facts against a dimension through the flow DSL with the native as-of") {
    // the temporal-enrichment pipeline a reference user would assemble:
    // source → two parallel-schedulable transforms → native as-of join
    // stage → parquet sink, all as one DAG. The click dimension is tiny,
    // so AsOfJoinStrategy auto-plans the BROADCAST regime inside the flow
    // — the fact branch reaches the join without a shuffle or sort
    val out = s"$tmpDir/enrich"
    val flow = G.sparkFlow(spark)
      .openFileParquet(s"${sf()}/events.parquet", "events")
      .transform("events")("purchases") { ev =>
        ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            col("ts").cast("timestamp").as("ts"))
      }
      .transform("events")("click_dim") { ev =>
        ev.where(col("event_type") === "click")
          .groupBy(col("user_id").as("c_user"),
            col("ts").cast("timestamp").as("c_ts"))
          .agg(max(col("value")).as("c_value"))
      }
      .transform("purchases", "click_dim")("enriched") { (p, d) =>
        graft.plans.AsOf.asOfJoin(p, d, Seq("user_id"), Seq("c_user"), "ts", "c_ts")
      }
      .writeParquet(out)("enriched")

    flow.isValidFlowDAG.isSuccess shouldBe true
    G.sparkExecutor(maxParallelActions = 4).execute(flow)

    val enriched = spark.read.parquet(s"$out/enriched")
    val purchases = spark.read.parquet(s"${sf()}/events.parquet")
      .where(col("event_type") === "purchase")
    enriched.count() shouldBe purchases.count() // left outer: every fact row
    // enrichment really matched (the corpus has clicks before purchases)
    enriched.where(col("c_value").isNotNull).count() should be > 0L
    // no click is later than its purchase: the as-of contract end-to-end
    enriched.where(col("c_ts") > col("ts")).count() shouldBe 0L
  }
}
