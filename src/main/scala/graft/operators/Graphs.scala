package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph-shaped post-processing for dedup pipelines.
  *
  * Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
  * doc per connected component of the similarity graph). This is iterative
  * min-label propagation expressed as joins — each round is two shuffles on
  * the vertex id, state is one (vertex, component) frame, and convergence is
  * a single count aggregate. Rounds grow with graph diameter (near-dup
  * components are shallow — a handful of rounds in practice); each iteration
  * checkpoints via persist so lineage stays bounded on a real cluster.
  */
object Graphs {

  /** Connected components over an undirected edge list.
    *
    * @param edges  (srcCol, dstCol) pairs
    * @return (vertex, component) — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20): DataFrame = {
    // the union references `edges` twice; both legs execute in parallel
    // stages, so recomputation costs no wall time (persisting the input
    // first measured slower — it serializes the chain)
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("vertex"))
      .distinct()
      .withColumn("component", col("vertex"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate label for each vertex: min over its own and neighbours'
      val viaNeighbours = sym
        .join(labels.withColumnRenamed("vertex", "dst")
          .withColumnRenamed("component", "n_component"), Seq("dst"))
        .groupBy(col("src").as("vertex"))
        .agg(min(col("n_component")).as("n_component"))
      val next = labels.join(viaNeighbours, Seq("vertex"), "left")
        .select(col("vertex"),
          least(col("component"), coalesce(col("n_component"), col("component")))
            .as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("component", "old"), Seq("vertex"))
        .where(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Dedup clusters from a document frame + near-dup pair frame: every doc
    * mapped to its cluster id (min doc id in the component; singletons map
    * to themselves) plus a keep flag. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      idACol: String, idBCol: String): DataFrame = {
    val components = connectedComponents(pairs, idACol, idBCol)
      .withColumnRenamed("vertex", idCol)
    docs.select(col(idCol))
      .join(components, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }
}
