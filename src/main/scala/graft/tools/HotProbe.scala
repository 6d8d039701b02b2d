package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for the round-14 hot queries: times each stage of
  * a hot query's pipeline in isolation (noop-equivalent toRdd sink) so the
  * optimization targets the measured dominant term, not a guess.
  * Select probes with args, e.g. runMain graft.tools.HotProbe q131 q102.
  */
object HotProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.ensureRegistered(spark)
    val want = if (args.isEmpty) Set("q131", "q102", "q17", "q32") else args.toSet

    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(r =>
        scala.util.Try(r.unpersist(blocking = false)))
      spark.sharedState.cacheManager.clearCache()
    }
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def t(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")
    // steady-state warmup as Bench does
    Seq("orders", "lineitem", "documents").foreach(n => t(n).count())

    if (want("q131")) {
      import graft.operators.Sketches
      val li = t("lineitem").select(col("l_orderkey").as("k"))
      val ord = t("orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"))
      for (rep <- 1 to 3) {
        timed(s"q131.sketch_li.$rep")(run(Sketches.countMinSketch(li, "k", 4, 2048)))
        drop()
      }
      // the map-side bucket expression alone, no shuffle: hashing cost
      val justHash = li.select(Sketches.buckets(col("k"), 4, 2048).as("b"))
      for (rep <- 1 to 2) { timed(s"q131.hash_only.$rep")(run(justHash)); drop() }
      timed("q131.sketch_ord")(run(Sketches.countMinSketch(ord, "k", 4, 2048)))
      drop()
      for (rep <- 1 to 2) {
        timed(s"q131.exact_join.$rep")(run(li.join(ord, Seq("k")).agg(count(lit(1)))))
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q131.full.$rep")(run(graft.SparkEntry.queries("q131_cm_join_size")(spark, sfDir)))
        drop()
      }
    }

    if (want("q102")) {
      import graft.operators.Bpe
      val docs = t("documents")
      for (rep <- 1 to 3) {
        timed(s"q102.word_counts.$rep")(run(Bpe.wordCounts(docs, col("text"))))
        drop()
      }
      // tokenize pass alone (regex extract + explode, no grouping)
      val toks = docs.select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      for (rep <- 1 to 2) { timed(s"q102.extract_only.$rep")(run(toks)); drop() }
      for (rep <- 1 to 2) {
        timed(s"q102.learn.$rep") {
          val (m, v) = Bpe.learnBpe(docs, col("text"), numMerges = 8)
          v.unpersist(); m.size
        }
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q39.full.$rep")(run(graft.SparkEntry.queries("q39_bpe_tokens")(spark, sfDir)))
        drop()
      }
    }

    if (want("q17")) {
      import graft.operators.Dedup
      val docs = t("documents")
      val prepped = Dedup.prepareNgrams(docs, "doc_id", "text",
        Seq(col("lang"), floor(col("n_chars") / lit(50)).as("len_bucket")), 3)
      timed("q17.prepare_ngrams")(run(prepped))
      drop()
      timed("q17.full")(run(graft.SparkEntry.queries("q17_ngram_jaccard_pairs")(spark, sfDir)))
      drop()
      timed("q17.full_warm")(run(graft.SparkEntry.queries("q17_ngram_jaccard_pairs")(spark, sfDir)))
      drop()
    }

    if (want("q32")) {
      import graft.operators.Dedup
      val docs = t("documents")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCols = Seq(col("lang"), floor(col("n_chars") / lit(50)).as("len_bucket")),
        n = 3, threshold = 0.7)
      timed("q32.pairs_only")(run(pairs))
      drop()
      timed("q32.full")(run(graft.SparkEntry.queries("q32_dup_clusters")(spark, sfDir)))
      drop()
      timed("q133.full")(run(graft.SparkEntry.queries("q133_leakage_safe_split")(spark, sfDir)))
      drop()
    }

    if (want("q114")) {
      import graft.operators.Dedup
      val docs = t("documents")
      val dp = docs.select(col("doc_id").cast("long").as("__id"),
        explode(Dedup.md5GramHashUdf(5)(col("text"))).as("__h"))
      for (rep <- 1 to 2) { timed(s"q114.explode_only.$rep")(run(dp)); drop() }
      for (rep <- 1 to 2) {
        timed(s"q114.first_seen.$rep")(
          run(dp.groupBy(col("__h")).agg(min(col("__id")).as("__first"))))
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q114.full.$rep")(
          run(graft.SparkEntry.queries("q114_shingle_novelty")(spark, sfDir)))
        drop()
      }
    }

    if (want("q34")) {
      import graft.plans.AsOf
      val ev = t("events").select(col("event_id"), col("user_id"), col("ts"))
      for (rep <- 1 to 2) {
        timed(s"q34.full.$rep")(
          run(graft.SparkEntry.queries("q34_asof_join")(spark, sfDir)))
        drop()
      }
      // the asof body without the final global orderBy
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = t("orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_custkey").as("r_user"),
          col("o_orderdate").cast("timestamp").as("r_ts"),
          col("o_orderkey"), col("o_totalprice"))
      val joined = AsOf.asOfJoin(
        t("events").select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts")),
        ord, Seq("user_id"), Seq("r_user"), "ts", "r_ts",
        broadcastRight = Some(false))
      for (rep <- 1 to 2) { timed(s"q34.no_sort.$rep")(run(joined)); drop() }
      timed("q34.orders_dedup_only")(run(ord))
      drop()
    }

    if (want("q114b")) {
      import graft.operators.Dedup
      val docs = t("documents")
      val g = docs.select(col("doc_id").cast("long").as("__id"),
        Dedup.md5GramHashUdf(5)(col("text")).as("__g"))
      val per = g.select(col("__id"), size(col("__g")).cast("long").as("n_shingles"))
        .where(col("n_shingles") > 0L)
      for (rep <- 1 to 2) { timed(s"q114b.per_only.$rep")(run(per)); drop() }
      val novel = g.select(col("__id"), explode(col("__g")).as("__h"))
        .groupBy(col("__h")).agg(min(col("__id")).as("__first"))
        .groupBy(col("__first")).agg(count(lit(1)).as("n_novel"))
      for (rep <- 1 to 2) { timed(s"q114b.novel_only.$rep")(run(novel)); drop() }
      val joined = per.join(novel, col("__id") === col("__first"), "left")
      for (rep <- 1 to 2) { timed(s"q114b.joined.$rep")(run(joined)); drop() }
      for (rep <- 1 to 2) {
        timed(s"q114b.full_sorted.$rep")(
          run(graft.SparkEntry.queries("q114_shingle_novelty")(spark, sfDir)))
        drop()
      }
    }

    if (want("q34c")) {
      import graft.plans.AsOf
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      def joined() = {
        val ev = t("events").select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp").as("ts"))
        val ord = t("orders")
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("o_custkey").as("r_user"),
            col("o_orderdate").cast("timestamp").as("r_ts"),
            col("o_orderkey"), col("o_totalprice"))
        AsOf.asOfJoin(ev, ord, Seq("user_id"), Seq("r_user"), "ts", "r_ts",
          broadcastRight = Some(false))
          .select(col("event_id"), col("user_id"), col("ts"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("o_totalprice"))
      }
      for (rep <- 1 to 2) {
        timed(s"q34c.plain_sort.$rep")(run(joined().orderBy(col("event_id"))))
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q34c.ckpt_sort.$rep") {
          val m = joined().localCheckpoint(true)
          val n = run(m.orderBy(col("event_id")))
          m.unpersist(); n
        }
        drop()
      }
    }

    if (want("q100b")) {
      for (rep <- 1 to 2) {
        timed(s"q100b.full.$rep")(
          run(graft.SparkEntry.queries("q100_chunk_version_diff")(spark, sfDir)))
        drop()
      }
    }

    if (want("q34b")) {
      import graft.plans.AsOf
      val evRaw = t("events")
      println(s"PROBE q34b.events_rows ${evRaw.count()}")
      val ev = evRaw.select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"))
      for (rep <- 1 to 2) {
        timed(s"q34b.sort_events_only.$rep")(run(ev.orderBy(col("event_id"))))
        drop()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ord = t("orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_custkey").as("r_user"),
          col("o_orderdate").cast("timestamp").as("r_ts"),
          col("o_orderkey"), col("o_totalprice"))
      for (rep <- 1 to 2) { timed(s"q34b.ord_dedup.$rep")(run(ord)); drop() }
      val joined = AsOf.asOfJoin(ev, ord, Seq("user_id"), Seq("r_user"),
        "ts", "r_ts", broadcastRight = Some(false))
      for (rep <- 1 to 2) {
        timed(s"q34b.join_sorted.$rep")(run(joined.orderBy(col("event_id"))))
        drop()
      }
    }

    if (want("q100")) {
      import graft.operators.Chunking
      val docs = t("documents")
      for (rep <- 1 to 2) {
        timed(s"q100.cdc_once.$rep")(
          run(Chunking.contentDefinedChunks(docs, "doc_id", "text")))
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q100.full.$rep")(
          run(graft.SparkEntry.queries("q100_chunk_version_diff")(spark, sfDir)))
        drop()
      }
    }

    if (want("q157")) {
      for (rep <- 1 to 2) {
        timed(s"q157.full.$rep")(
          run(graft.SparkEntry.queries("q157_bm25_retrieval")(spark, sfDir)))
        drop()
      }
    }

    if (want("q123")) {
      import graft.operators.Dedup
      val en = t("documents").where(col("lang") === "en")
      val p = en.select(col("doc_id"),
        Dedup.md5CharGramHashUdf(7)(col("text")).as("g"))
      for (rep <- 1 to 2) { timed(s"q123.gram_hash.$rep")(run(p)); drop() }
      for (rep <- 1 to 2) {
        timed(s"q123.full.$rep")(
          run(graft.SparkEntry.queries("q123_containment_pairs")(spark, sfDir)))
        drop()
      }
    }

    if (want("q71")) {
      for (rep <- 1 to 2) {
        timed(s"q71.full.$rep")(
          run(graft.SparkEntry.queries("q71_rolling_z")(spark, sfDir)))
        drop()
      }
    }

    if (want("q02")) {
      val customer = t("customer"); val orders = t("orders")
      val lineitem = t("lineitem"); val nation = t("nation")
      def oldShape() = lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,8)")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("n_name"))
      for (rep <- 1 to 3) { timed(s"q02.old.$rep")(run(oldShape())); drop() }
      for (rep <- 1 to 3) {
        timed(s"q02.new.$rep")(
          run(graft.SparkEntry.queries("q02_revenue_by_nation")(spark, sfDir)))
        drop()
      }
    }

    if (want("q152")) {
      for (rep <- 1 to 3) {
        timed(s"q152.full.$rep")(
          run(graft.SparkEntry.queries("q152_gif_frame_sample")(spark, sfDir)))
        drop()
      }
      for (rep <- 1 to 2) {
        timed(s"q153.full.$rep")(
          run(graft.SparkEntry.queries("q153_compressed_ingest")(spark, sfDir)))
        drop()
      }
    }

    if (want("q18")) {
      import graft.operators.Dedup
      val docs = t("documents")
      val signed = Dedup.minHashSignatures(docs, "doc_id", "text", 8, 8, 3)
      for (rep <- 1 to 2) { timed(s"q18.sign_only.$rep")(run(signed)); drop() }
      for (rep <- 1 to 2) {
        timed(s"q18.full.$rep")(
          run(graft.SparkEntry.queries("q18_minhash_lsh_pairs")(spark, sfDir)))
        drop()
      }
    }

    if (want("q140")) {
      for (rep <- 1 to 2) {
        timed(s"q140.full.$rep")(
          run(graft.SparkEntry.queries("q140_curation_pipeline")(spark, sfDir)))
        drop()
      }
    }

    if (want("q103")) {
      for (rep <- 1 to 2) {
        timed(s"q103.full.$rep")(
          run(graft.SparkEntry.queries("q103_incremental_dedup")(spark, sfDir)))
        drop()
      }
    }

    // ---- round-15 probes ----

    if (want("q123s")) { // containment candidate-channel stage decomposition
      import graft.operators.{Dedup, Materialize}
      import org.apache.spark.sql.expressions.Window
      val docs = t("documents").where(col("lang") === "en")
      val p = Materialize(docs.where(col("text").isNotNull)
        .select(col("doc_id"), Dedup.md5CharGramHashUdf(7)(col("text")).as("g")))
      timed("q123s.materialize_grams")(run(p))
      val sz = p.select(col("doc_id"), col("g"), size(col("g")).as("n"))
      val idx = p.select(col("doc_id"), explode(col("g")).as("gram"))
      for (r <- 1 to 2) timed(s"q123s.explode_only.$r")(run(idx))
      val dfreq = idx.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      for (r <- 1 to 2) timed(s"q123s.dfreq.$r")(run(dfreq))
      val idxF = idx.join(dfreq, Seq("gram")).where(col("df") <= 50)
      for (r <- 1 to 2) timed(s"q123s.idxF.$r")(run(idxF))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))
      val pre = idxF
        .withColumn("rn", row_number().over(w))
        .join(sz.select(col("doc_id"), col("n")), Seq("doc_id"))
        .where(col("rn") <= floor((lit(1.0) - lit(0.8)) * col("n")).cast("int") + 1)
        .select("doc_id", "gram")
      for (r <- 1 to 2) timed(s"q123s.pre.$r")(run(pre))
      val idx2 = idxF.select("doc_id", "gram")
      val cand = pre.as("a")
        .join(idx2.as("b"),
          col("a.gram") === col("b.gram") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("id_contained"), col("b.doc_id").as("id_container"))
      for (r <- 1 to 2) timed(s"q123s.cand_nodistinct.$r")(run(cand))
      for (r <- 1 to 2) timed(s"q123s.cand_distinct.$r")(run(cand.distinct()))
      Materialize.release(p)
      drop()
      for (r <- 1 to 2) {
        timed(s"q123s.full.$r")(
          run(graft.SparkEntry.queries("q123_containment_pairs")(spark, sfDir)))
        drop()
      }
    }

    if (want("q67")) { // semdedup: kmeans rounds vs pair scoring
      import graft.operators.{Similarity, Materialize}
      val emb = t("embeddings")
      val c = Materialize(emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v")))
      timed("q67.materialize")(run(c))
      for (r <- 1 to 2) timed(s"q67.kmeans.$r")(
        Similarity.kmeansCentroids(c, "id", "v", 8, 2).length)
      val cents = Similarity.kmeansCentroids(c, "id", "v", 8, 2)
      val assigned = c.withColumn("cell",
        Similarity.cellAssign(spark, cents)(col("v")))
      for (r <- 1 to 2) timed(s"q67.assign.$r")(run(assigned))
      val pairs = Similarity.cosineNearDupPairs(
        assigned.withColumnRenamed("id", "vec_id").withColumnRenamed("v", "embedding"),
        "vec_id", "embedding", col("cell"), 0.3)
      for (r <- 1 to 2) timed(s"q67.pairs.$r")(run(pairs))
      Materialize.release(c)
      drop()
      for (r <- 1 to 2) {
        timed(s"q67.full.$r")(
          run(graft.SparkEntry.queries("q67_semdedup")(spark, sfDir)))
        drop()
      }
    }

    if (want("q86")) { // personalized pagerank vs plain pagerank, edge build
      val edges = t("orders")
        .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      for (r <- 1 to 2) { timed(s"q86.edges_only.$r")(run(edges)); drop() }
      for (r <- 1 to 2) {
        timed(s"q86.full.$r")(
          run(graft.SparkEntry.queries("q86_personalized_pagerank")(spark, sfDir)))
        drop()
      }
      for (r <- 1 to 2) {
        timed(s"q74.full.$r")(
          run(graft.SparkEntry.queries("q74_pagerank")(spark, sfDir)))
        drop()
      }
    }

    if (want("q121")) { // entity resolution: pair gen vs components vs expansion
      import graft.operators.{Fuzzy, Materialize, Graphs}
      val part = t("part")
      val ids = part.select(col("p_partkey").as("__fid"), col("p_name").as("name"))
        .where(col("name").isNotNull)
      val names = Materialize(ids.select("name").distinct())
      timed("q121.names_distinct")(run(names))
      val pairs = Fuzzy.fuzzyDupPairs(part, "p_partkey", "p_name", 2, Some(1000L))
      for (r <- 1 to 2) { timed(s"q121.fuzzy_pairs_idlevel.$r")(run(pairs)); drop() }
      Materialize.release(names)
      for (r <- 1 to 2) {
        timed(s"q121.full.$r")(
          run(graft.SparkEntry.queries("q121_entity_resolution")(spark, sfDir)))
        drop()
      }
      for (r <- 1 to 2) {
        timed(s"q147.full.$r")(
          run(graft.SparkEntry.queries("q147_fuzzy_dups_bounded")(spark, sfDir)))
        drop()
      }
    }

    if (want("media")) { // decode-partition sizing sweep (q150–q155)
      graft.SparkEntry.prewarmMediaFrames(spark, sfDir)
      val qs = Seq("q150_real_image_phash", "q151_audio_profile",
        "q152_gif_frame_sample", "q153_compressed_ingest", "q154_warc_ingest",
        "q155_crawl_pipeline")
      for (kb <- Seq(512, 1024, 2048, 4096, 8192, 32768, 262144)) {
        spark.conf.set("spark.graft.media.decodeTargetBytes", (kb.toLong << 10).toString)
        for (qn <- qs) {
          timed(s"media.$qn.t${kb}k")(
            run(graft.SparkEntry.queries(qn)(spark, sfDir)))
          drop()
        }
      }
      spark.conf.unset("spark.graft.media.decodeTargetBytes")
    }

    if (want("q139")) { // storage band: point lookup + sparse index cycles
      for (r <- 1 to 2) {
        timed(s"q139.full.$r")(
          run(graft.SparkEntry.queries("q139_point_lookup")(spark, sfDir)))
        drop()
      }
      for (r <- 1 to 2) {
        timed(s"q159.full.$r")(
          run(graft.SparkEntry.queries("q159_sparse_index_retrieval")(spark, sfDir)))
        drop()
      }
      for (r <- 1 to 2) {
        timed(s"q161.full.$r")(
          run(graft.SparkEntry.queries("q161_bpe_oov")(spark, sfDir)))
        drop()
      }
    }

    spark.stop()
  }
}
