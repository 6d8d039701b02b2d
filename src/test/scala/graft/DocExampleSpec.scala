package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The README quick-start, compiled and executed — if this spec passes, the
  * documented example works verbatim. */
class DocExampleSpec extends SparkTestBase with Matchers {

  it("driver entry point (smoke contract) returns rows") {
    // the driver smoke-checks rows>0 on sf0.001 every round; guard it here
    // so a refactor can't silently break the contract between rounds
    SparkEntry.entry(spark).count() should be > 0L
  }

  it("runs the README quick-start pipeline end-to-end") {
    val testdata = sf() // /root/testdata/sf0.001
    val out = s"$tmpDir/published"

    // --- README example starts here ---
    import graft.dataflow.spark.{Graft, ParquetDataCommitter}
    import graft.dataflow.spark.actions._
    import graft.dataflow.spark.commit._
    import graft.operators.{Dedup, Graphs, Sampling}

    val flow = Graft.sparkFlow(spark, tempFolder = s"$tmpDir/flow-tmp")
      // sources become labelled entities
      .openFileParquet(s"$testdata/customer.parquet", "customer")
      .openFileParquet(s"$testdata/orders.parquet", "orders")
      // any Spark code inside transform / sql actions
      .sql("customer", "orders")("spend",
        """select c_custkey, count(*) as n_orders, sum(o_totalprice) as spend
          |from customer join orders on c_custkey = o_custkey
          |group by c_custkey""".stripMargin)
      // deterministic 50% sample, stable across reruns and repartitioning
      .transform("spend")("sampled")(Sampling.hashSample(_, col("c_custkey"), 0.5))
      // transactional publish: stage -> atomic rename -> cleanup
      .commit("daily")("sampled")
      .push("daily")(ParquetDataCommitter(out))

    val (executed, _) = Graft.sparkExecutor(maxParallelActions = 8).execute(flow)
    // --- README example ends here ---

    executed.nonEmpty shouldBe true
    val published = spark.read.parquet(s"$out/sampled")
    published.columns.toSet shouldBe Set("c_custkey", "n_orders", "spend")
    published.count() should be > 0L

    // standalone operators work on plain DataFrames too
    val docs = spark.read.parquet(s"$testdata/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq(col("lang")), n = 3, threshold = 0.7)
    val clusters = Graphs.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
    clusters.count() shouldBe docs.count()
  }

  it("runs the README hybrid-retrieval example end-to-end") {
    import spark.implicits._
    val testdata = sf()
    val indexDir = s"$tmpDir/readme-sparse-idx"
    val today = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val docs = spark.read.parquet(s"$testdata/documents.parquet")
    val corpusVecs = spark.read.parquet(s"$testdata/embeddings.parquet")
    val oneQuery = Seq((1L, "spark window join")).toDF("query_id", "qtext")
    val oneQueryVec = corpusVecs.where(col("vec_id") === 0)

    // --- README example starts here ---
    import graft.operators.{Ranking, Similarity, SparseIndex}
    val store  = SparseIndex.indexBatch(                  // tokenize once, ever
      SparseIndex.openOrCreate(spark, indexDir), docs, "doc_id", "text", today)
    val sparse = Ranking.bm25Retrieve(                    // postings-proportional
      SparseIndex.bm25IndexAsOf(store, today), oneQuery, "query_id", "qtext", k = 20)
    val dense  = Similarity.bruteForceTopK(corpusVecs, oneQueryVec,
      "vec_id", "embedding", k = 20)                      // or AnnIndex at scale
    val fused  = Ranking.rrfFuse(Seq(                     // one fused ranking
        sparse.select(col("doc_id"), col("rank")),
        dense.select(col("neighbor_id").as("doc_id"), col("rank"))),
      "doc_id", "rank", topK = 10)
    // --- README example ends here ---

    val rows = fused.collect()
    rows.length shouldBe 10
    rows.map(_.getAs[Long]("rank")).sorted shouldBe (1L to 10L).toArray
  }
}
