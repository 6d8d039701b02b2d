package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.storage.{AuditTableInfo, Storage}

/** Persisted IVF index over the storage layer — the ANN twin of
  * [[DedupIndex]]'s operational loop: TRAIN once, INGEST daily against the
  * frozen centroids, QUERY any snapshot — the corpus is never re-clustered
  * and queries never scan vectors outside their probed cells.
  *
  * {{{
  * day 0:  buildIvf(path, corpus0, ...)        // k-means + assign + store
  * day N:  appendVectors(path, batchN, ...)    // frozen-centroid assignment
  * any t:  queryIvf(path, queries, k, nProbe, asOf = t)
  * }}}
  *
  * Two audit tables: `ivf_centroids` (PK cell — nLists rows, the ONLY
  * state a query must load to the driver) and `ivf_codes` (PK vec_id —
  * cell + vector per row, so re-ingested ids REPLACE their old assignment
  * via PK snapshot semantics and compaction drops the superseded rows).
  * Region pruning applies: `snapshot(asOf)` reads only regions live at
  * `asOf`, so yesterday's query load does not scan today's ingest.
  *
  * Scale shape: training is [[Similarity.kmeansCentroids]] (driver state =
  * nLists×dim doubles); ingest is one map-side assignment pass; a query
  * joins the probe cells only (nProbe/nLists of the corpus). Centroids are
  * FROZEN by design — rebuild under drift is a new `buildIvf` into a FRESH
  * basePath (enforced: PK-latest-wins snapshots cannot delete, so a
  * rebuild over an existing index would leave stale cells/codes from the
  * old generation live and silently mix generations at query time; keep
  * the old path around for as long as its generation must stay queryable).
  */
object AnnIndex {

  val CodesTable = "ivf_codes"
  val CentroidsTable = "ivf_centroids"

  /** Guard against silent generation mixing: PK-latest-wins snapshots
    * cannot delete, so training INTO an existing index leaves stale
    * centroid cells / codebook entries / codes live beside the new ones. */
  private def requireFreshIndex(spark: SparkSession, basePath: String): Unit =
    require(Storage.openTable(spark, basePath, CentroidsTable).isEmpty,
      s"an index already exists under $basePath — rebuilds mix generations " +
        "(stale cells/codes survive PK snapshots); build into a fresh basePath")

  /** Train centroids on `vectors`, store them, and index those vectors.
    * `basePath` must not already hold an index (see [[requireFreshIndex]]). */
  def buildIvf(spark: SparkSession, basePath: String, vectors: DataFrame,
      idCol: String, vecCol: String, nLists: Int, lloydIters: Int,
      ts: Timestamp): Unit = {
    requireFreshIndex(spark, basePath)
    val c = Materialize(vectors.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("vec")))
    val cents = Similarity.kmeansCentroids(c, "vec_id", "vec", nLists, lloydIters)
    val centRows = cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val centDf = spark.createDataFrame(centRows).toDF("cell", "vec")
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(CentroidsTable, Seq("cell"),
        Map("content" -> "ivf-centroids"), retainHistory = false))
      .append(centDf, None, ts)
    appendVectors(spark, basePath, c, "vec_id", "vec", ts)
    Materialize.release(c)
  }

  /** Assign a new batch against the centroids as of `ts` and append it.
    * Re-ingested vec_ids replace their previous row (PK semantics). */
  def appendVectors(spark: SparkSession, basePath: String, vectors: DataFrame,
      idCol: String, vecCol: String, ts: Timestamp): Unit = {
    val cents = loadCentroids(spark, basePath, ts)
    val codes = vectors
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("cell",
        Similarity.cellAssign(spark, cents)(col("vec")).cast("long"))
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(CodesTable, Seq("vec_id"),
        Map("content" -> "ivf-codes"), retainHistory = false))
      .append(codes, None, ts)
  }

  private def loadCentroids(spark: SparkSession, basePath: String,
      asOf: Timestamp): Array[Array[Double]] =
    Storage.openTable(spark, basePath, CentroidsTable)
      .getOrElse(throw new IllegalStateException(
        s"no $CentroidsTable under $basePath — run buildIvf first"))
      .snapshot(asOf)
      .getOrElse(throw new IllegalStateException(
        s"$CentroidsTable has no data at $asOf"))
      .orderBy(col("cell")).select(col("vec"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Top-k cosine neighbours of each query from the index state as of
    * `asOf`: load centroids (nLists rows), probe the `nProbe` nearest
    * cells, score only their members. Output matches
    * [[Similarity.ivfTopK]]: (query_id, neighbor_id, cos, rank). */
  def queryIvf(spark: SparkSession, basePath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      asOf: Timestamp): DataFrame = {
    val cents = loadCentroids(spark, basePath, asOf)
    val indexed = Storage.openTable(spark, basePath, CodesTable)
      .getOrElse(throw new IllegalStateException(
        s"no $CodesTable under $basePath — run buildIvf first"))
      .snapshot(asOf)
      .getOrElse(throw new IllegalStateException(
        s"$CodesTable has no data at $asOf"))
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("vec").as("c_vec"))
    // shared probe (Quantization.nearestCells): loud dim-drift guard +
    // deterministic tie-break live in ONE definition across all IVF paths
    val probeUdf = udf { (v: Array[Double]) =>
      Quantization.nearestCells(cents, v, nProbe).map(_.toLong)
    }
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      // a null query vector can match nothing; dropping it here beats the
      // bare NPE the probe's v.length would throw mid-task
      .where(col("q_vec").isNotNull)
      .withColumn("cell", explode(probeUdf(col("q_vec"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(indexed, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        Similarity.nativeCosine(spark, col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  // ---- PQ-coded variant: codes-only storage --------------------------
  // The raw-vector ivf_codes table stores dim doubles per row — at 100 TB
  // the index is as large as the corpus. The PQ variant stores m bytes of
  // residual codes per row (m longs here; 64× smaller at dim=64/m=4 even
  // before byte packing) plus two tiny model tables, and answers queries
  // by asymmetric distance (ADC) against only the probed cells. Same
  // operational contract as the raw index: FROZEN coarse centroids AND
  // frozen codebooks after build (re-ingest encodes against them; drift =
  // a new buildIvfPq into a FRESH basePath), PK replacement on vec_id,
  // snapshot/region pruning from the audit tables.

  val PqCodesTable = "ivfpq_codes"
  val PqCodebooksTable = "ivfpq_codebooks"

  /** Train coarse centroids + residual PQ codebooks on `vectors`, store
    * both models, and index the vectors as codes only. One index per
    * `basePath` (the raw and PQ variants share the centroids table). */
  def buildIvfPq(spark: SparkSession, basePath: String, vectors: DataFrame,
      idCol: String, vecCol: String, nLists: Int, lloydIters: Int,
      m: Int = 4, codesPerSubspace: Int = 8, pqIters: Int = 1,
      ts: Timestamp): Unit = {
    import spark.implicits._
    requireFreshIndex(spark, basePath)
    val c = Materialize(vectors.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("vec")))
    val cents = Similarity.kmeansCentroids(c, "vec_id", "vec", nLists, lloydIters)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) })
      .toDF("cell", "vec")
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(CentroidsTable, Seq("cell"),
        Map("content" -> "ivf-centroids"), retainHistory = false))
      .append(centDf, None, ts)
    val withRes = Materialize(c
      .transform(Similarity.withCellAndResidual(spark, cents, "vec", "long"))
      .select(col("vec_id"), col("cell"), col("res")))
    val model = Quantization.train(withRes, "vec_id", "res",
      dim = cents(0).length, m = m, k = codesPerSubspace,
      lloydIters = pqIters, preMaterialized = true)
    val cbDf = model.codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (cent, ci) => (j.toLong, ci.toLong, cent.toSeq) }
    }.toSeq.toDF("subspace", "code", "vec")
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(PqCodebooksTable, Seq("subspace", "code"),
        Map("content" -> "ivfpq-codebooks"), retainHistory = false))
      .append(cbDf, None, ts)
    appendCodes(spark, basePath, withRes, model, ts)
    Materialize.release(withRes)
    Materialize.release(c)
  }

  /** Assign + residual-encode a new batch against the models as of `ts`
    * and append codes. Re-ingested vec_ids replace their row. */
  def appendVectorsPq(spark: SparkSession, basePath: String,
      vectors: DataFrame, idCol: String, vecCol: String, ts: Timestamp): Unit = {
    val cents = loadCentroids(spark, basePath, ts)
    val model = loadPqModel(spark, basePath, ts)
    val withRes = vectors
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("vec"))
      .transform(Similarity.withCellAndResidual(spark, cents, "vec", "long"))
      .select(col("vec_id"), col("cell"), col("res"))
    appendCodes(spark, basePath, withRes, model, ts)
  }

  private def appendCodes(spark: SparkSession, basePath: String,
      withRes: DataFrame, model: Quantization.PqModel, ts: Timestamp): Unit = {
    val coded = Quantization.encode(withRes, "vec_id", "res", model,
      passthrough = Seq("cell"))
    Storage.getOrCreateTable(spark, basePath,
      AuditTableInfo(PqCodesTable, Seq("vec_id"),
        Map("content" -> "ivfpq-codes"), retainHistory = false))
      .append(coded, None, ts)
  }

  private def loadPqModel(spark: SparkSession, basePath: String,
      asOf: Timestamp): Quantization.PqModel = {
    val rows = Storage.openTable(spark, basePath, PqCodebooksTable)
      .getOrElse(throw new IllegalStateException(
        s"no $PqCodebooksTable under $basePath — run buildIvfPq first"))
      .snapshot(asOf)
      .getOrElse(throw new IllegalStateException(
        s"$PqCodebooksTable has no data at $asOf"))
      .select(col("subspace"), col("code"), col("vec")).collect()
    require(rows.nonEmpty, s"$PqCodebooksTable empty at $asOf")
    val m = rows.map(_.getLong(0)).max.toInt + 1
    val k = rows.map(_.getLong(1)).max.toInt + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      codebooks(r.getLong(0).toInt)(r.getLong(1).toInt) =
        r.getSeq[Double](2).toArray
    }
    require(codebooks.forall(_.forall(_ != null)),
      s"$PqCodebooksTable incomplete at $asOf")
    Quantization.PqModel(codebooks.head.head.length, codebooks)
  }

  /** ADC top-k from the codes-only index as of `asOf`: load the two model
    * tables (nLists + m·k tiny rows — the ONLY driver state), probe the
    * `nProbe` nearest cells per query with per-(query, cell) residual
    * distance tables on the broadcast side, score each probed-cell member
    * with m table lookups — the corpus-side scan reads m longs per row,
    * never a vector. Output: (query_id, neighbor_id, adc_dist, rank),
    * matching [[Quantization.ivfPqTopK]]. */
  def queryIvfPq(spark: SparkSession, basePath: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      asOf: Timestamp, scale: Int = 6): DataFrame =
    queryIvfPqShortlist(spark, basePath, queries, idCol, vecCol, k, nProbe,
      asOf, scale)

  /** [[queryIvfPq]] + exact COSINE re-rank of an ADC shortlist: codes give
    * `shortlist`-many candidates per query (cheap, m lookups each), then
    * ONLY those rows fetch their raw vector from `corpus` by id and
    * re-score exactly. The fetch broadcasts the (queries × shortlist)-sized
    * candidate set against ONE map-side pass over the corpus projection —
    * no corpus shuffle; with an audit-table corpus, `snapshotPoint` (PK
    * bloom sidecars) can replace the scan with regional point lookups.
    * This is the IVFADC + re-rank split every production
    * vector store runs: the index stays codes-only (storage ~dim/m of the
    * corpus), full precision lives where it already exists (the source
    * table), and ADC's within-shortlist ranking noise (it quantizes away
    * exactly the small margins that decide ranks 1–10) never reaches the
    * final order. Output: (query_id, neighbor_id, cos, rank) — the raw
    * index's shape. */
  def queryIvfPqRerank(spark: SparkSession, basePath: String,
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbe: Int, asOf: Timestamp, shortlist: Int = 0,
      scale: Int = 6, maxBroadcastCandidates: Long = 2L * 1000 * 1000): DataFrame = {
    val sl = if (shortlist > 0) shortlist else math.max(k * 5, 50)
    val cand = queryIvfPqShortlist(spark, basePath, queries, idCol, vecCol,
      sl, nProbe, asOf, scale).select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val cv = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"))
    // The candidate set is queries x shortlist rows — tiny for interactive
    // batches, but a force-broadcast of a MILLION-query batch would blow
    // the 8GB broadcast limit where a planner-chosen join works. Gate the
    // hint LAZILY on the optimizer's size estimate for the queries frame
    // (scan stats — no job runs at construction, so explain/PlanDump stay
    // free, matching adcTopK's lazy-guard contract): rowCount when CBO
    // supplies it, else bytes at a conservative ~100B/row floor.
    val stats = qv.queryExecution.optimizedPlan.stats
    val estQueries: BigInt = stats.rowCount
      .getOrElse((stats.sizeInBytes / 100) max BigInt(1))
    val smallBatch = estQueries * sl <= BigInt(maxBroadcastCandidates)
    def hint(df: DataFrame): DataFrame = if (smallBatch) broadcast(df) else df
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    // small batch: broadcast the candidate set so the corpus side is read
    // in one map-side pass with no shuffle (a plain join could shuffle
    // BOTH sides); large batch: let the planner/AQE pick the join — a
    // shuffle beats an oversized broadcast
    hint(cand).join(cv, Seq("neighbor_id"))
      .join(hint(qv), Seq("query_id"))
      .withColumn("cos",
        Similarity.nativeCosine(spark, col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  private def queryIvfPqShortlist(spark: SparkSession, basePath: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int, nProbe: Int,
      asOf: Timestamp, scale: Int): DataFrame = {
    val cents = loadCentroids(spark, basePath, asOf)
    val model = loadPqModel(spark, basePath, asOf)
    val m = model.m
    val coded = Storage.openTable(spark, basePath, PqCodesTable)
      .getOrElse(throw new IllegalStateException(
        s"no $PqCodesTable under $basePath — run buildIvfPq first"))
      .snapshot(asOf)
      .getOrElse(throw new IllegalStateException(
        s"$PqCodesTable has no data at $asOf"))
      .select(col("vec_id").as("neighbor_id") +: col("cell") +:
        (0 until m).map(j => col(s"code_$j")): _*)
    val probeUdf = udf { (v: Array[Double]) =>
      Quantization.nearestCellsWithResiduals(cents, v, nProbe) // shared probe
    }
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
      .where(col("q_vec").isNotNull) // see queryIvf: skip, don't NPE
      .withColumn("_probe", explode(probeUdf(col("q_vec"))))
      .select(col("query_id"), col("_probe._1").as("cell"),
        col("_probe._2").as("q_res"))
    val tabled = broadcast(Quantization.withDistTables(q, "q_res", model))
    val dist = (0 until m).map { j =>
      element_at(col(s"table_$j"), col(s"code_$j").cast("int") + 1)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    tabled.join(coded, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", round(dist, scale))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("long").as("rank"))
  }
}
