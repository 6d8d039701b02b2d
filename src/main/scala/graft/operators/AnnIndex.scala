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
  * FROZEN by design — rebuild under drift is a new `buildIvf` at a new
  * timestamp, and the audit history keeps both generations queryable.
  */
object AnnIndex {

  val CodesTable = "ivf_codes"
  val CentroidsTable = "ivf_centroids"

  /** Train centroids on `vectors`, store them, and index those vectors. */
  def buildIvf(spark: SparkSession, basePath: String, vectors: DataFrame,
      idCol: String, vecCol: String, nLists: Int, lloydIters: Int,
      ts: Timestamp): Unit = {
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
        Similarity.cellAssignUdf(cents)(col("vec")).cast("long"))
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
    val probeUdf = udf { (v: Array[Double]) =>
      // fail loudly on dimension drift: a longer query vector would throw
      // ArrayIndexOutOfBounds mid-centroid, a shorter one would silently
      // probe on a truncated distance — both are schema bugs at the caller
      require(cents.isEmpty || v.length == cents(0).length,
        s"query vector dim ${v.length} does not match trained centroid " +
          s"dim ${cents(0).length} — re-encode queries or rebuild the index")
      cents.indices.map { ci =>
        val cent = cents(ci); var d = 0.0; var i = 0
        while (i < v.length) { val x = v(i) - cent(i); d += x * x; i += 1 }
        (d, ci)
      }.sorted.take(nProbe).map(_._2.toLong).toArray
    }
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("q_vec"))
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
}
