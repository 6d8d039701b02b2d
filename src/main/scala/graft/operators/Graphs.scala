package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-shaped post-processing for dedup pipelines.
  *
  * Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
  * doc per connected component of the similarity graph). This is min-label
  * propagation expressed as joins, accelerated with pointer jumping:
  * each round a vertex adopts the minimum of its own label, its neighbours'
  * labels, and its label's label (`component(component(v))`). The jump step
  * doubles the effective propagation distance per round, so convergence is
  * O(log diameter) rounds instead of O(diameter) — a 2^30-diameter chain
  * (beyond any real corpus) finishes inside the default iteration budget.
  *
  * Every round materialises through [[Materialize]] (localCheckpoint by
  * default: bounded lineage, no leaked cache entries; replicated persist
  * via `spark.graft.materialize.mode=persist` when executors can be lost);
  * iteration state is one narrow (vertex, component) frame shuffled on the
  * vertex id.
  */
object Graphs {

  /** Connected components over an undirected edge list.
    *
    * @param edges  (srcCol, dstCol) pairs
    * @return (vertex, component) — component = min vertex id reachable.
    * @throws IllegalStateException if the labels have not converged after
    *         `maxIterations` rounds (returning non-converged — i.e. wrong —
    *         cluster ids silently is never acceptable).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 25): DataFrame = {
    // materialise the edge list BEFORE symmetrising: both union legs read
    // it, and the upstream pair pipeline (shingling + blocked join + verify)
    // is far too expensive to execute twice. The union itself stays lazy —
    // it is a narrow op over the checkpointed blocks, and min-propagation is
    // idempotent over duplicate edges, so no distinct (a full extra shuffle
    // of the edge list) and no second checkpoint are needed
    val mat = Materialize(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val sym = mat.union(mat.select(col("dst").as("src"), col("src").as("dst")))

    // init already folds one neighbour-min round: component0(v) =
    // min(v, N(v)) — same aggregation cost as building the plain vertex
    // list, one fewer loop iteration
    // matState is the materialized frame of the round (release target in
    // persist mode); labels is the (vertex, component) view over it
    var matState = sym.groupBy(col("src").as("vertex"))
      .agg(least(min(col("dst")), col("src")).as("component"))
      .transform(Materialize.apply)
    var labels = matState

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // min label over the vertex's neighbours
      val viaNeighbours = sym
        .join(labels.withColumnRenamed("vertex", "dst")
          .withColumnRenamed("component", "n_component"), Seq("dst"))
        .groupBy(col("src").as("vertex"))
        .agg(min(col("n_component")).as("n_component"))
      // pointer jump: the label of the vertex's current label
      val viaJump = labels.select(col("vertex").as("component"), col("component").as("j_component"))
      val next = labels
        .join(viaNeighbours, Seq("vertex"), "left")
        .join(viaJump, Seq("component"), "left")
        .select(col("vertex"),
          least(
            col("component"),
            coalesce(col("n_component"), col("component")),
            coalesce(col("j_component"), col("component"))).as("component"),
          col("component").as("old"))
        .transform(Materialize.apply)
      converged = next.where(col("component") =!= col("old")).limit(1).count() == 0
      Materialize.release(matState) // superseded round state (persist mode only)
      matState = next
      labels = next.select(col("vertex"), col("component"))
      iter += 1
    }
    Materialize.release(mat)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIterations rounds; " +
          "raise maxIterations (rounds needed ~ log2 of the largest component's diameter)")
    labels
  }

  /** Adaptive connected components: near-dup graphs are SPARSE (edges ≪
    * vertices after LSH banding), so after materialising the edge list the
    * actual edge count is known for the price of a count over checkpointed
    * blocks — the same runtime-statistics trick AQE uses to pick broadcast
    * joins. At or below `driverEdgeLimit` integral-keyed edges the
    * component labels come from a driver union-find (milliseconds, zero
    * iterative Spark jobs); above it, or for non-integral vertex ids, the
    * distributed pointer-jumping loop runs unchanged. Both paths produce
    * identical labels (component = min reachable vertex id). */
  def connectedComponentsAuto(edges: DataFrame, srcCol: String, dstCol: String,
      driverEdgeLimit: Long = 1000000L, maxIterations: Int = 25): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val sel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val integral = sel.schema.fields.forall(f =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType))
    if (!integral) return connectedComponents(edges, srcCol, dstCol, maxIterations)
    val mat = Materialize(sel)
    val result =
      if (mat.count() <= driverEdgeLimit) {
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        val verts = scala.collection.mutable.HashSet.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        mat.collect().foreach { row =>
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val (a, b) = (row.getAs[Number](0).longValue(), row.getAs[Number](1).longValue())
            verts += a; verts += b
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) { // min-label union: the smaller root wins
              if (ra < rb) parent(rb) = ra else parent(ra) = rb
            }
          }
        }
        val labels = verts.iterator.map(v => (v, find(v))).toSeq
        val spark = edges.sparkSession
        import spark.implicits._
        labels.toDF("vertex", "component")
          .select(col("vertex").cast(sel.schema("src").dataType),
            col("component").cast(sel.schema("src").dataType))
      } else connectedComponents(mat, "src", "dst", maxIterations)
    Materialize.release(mat)
    result
  }

  /** Fixed-iteration PageRank over an edge list — the importance/centrality
    * primitive (seed-page weighting, spam-domain discounting, entity
    * salience). Deterministic by construction: a FIXED number of power
    * iterations (no convergence test — runs are reproducible and the
    * computation is SQL-unrollable for verification), each score rounded to
    * `iterScale` decimals per round so independent engines cannot drift
    * apart through float sum ordering.
    *
    * Dangling vertices (no out-edges) leak their mass — the plain
    * power-iteration variant; total mass is then < 1, which rescales
    * rankings identically and keeps each iteration a single join + agg
    * (dangling redistribution would add a global barrier per round).
    * Multi-edges count multiplicity (a src with two edges to the same dst
    * sends it double weight); pre-`distinct` the edges to change that.
    *
    * Scale shape per iteration: one shuffle joining scores to edges on src
    * (out-degree pre-attached), one map-combined aggregation by dst. The
    * score relation is |V|-sized; edges never re-shuffle once bucketed.
    * Output: (vertex, pagerank) over ALL vertices, including dangling ones.
    */
  /** Shared power-iteration core: materialized edges + (vertex, deg) base.
    * `setup` sees the MATERIALIZED base plus its already-computed vertex
    * count (the sizing aggregation below produces it anyway — a separate
    * `base.count()` job would re-scan for a number we have) and returns
    * (possibly-augmented base, initial-score expression, per-round teleport
    * expression). An augmented base (extra per-vertex columns, e.g. a
    * precomputed seed teleport weight) is re-materialized ONCE so its
    * expressions are physically stored instead of re-evaluated inside every
    * iteration's projection and re-analyzed in every round's growing plan. */
  private def powerIterate(edges: DataFrame, srcCol: String, dstCol: String,
      setup: (DataFrame, Long) => (DataFrame, Column, Column), iterations: Int,
      damping: Double, iterScale: Int, scale: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    def ph[A](label: String)(f: => A): A =
      if (sys.env.contains("SPARK_GRAFT_DEBUG")) {
        val t0 = System.nanoTime(); val r = f
        println(f"[graphs] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
      } else f
    val sel = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val e = ph("materialize edges")(Materialize(sel)) // reused every iteration
    // vertex set AND out-degrees in ONE aggregation: both edge endpoints
    // flow into a single map-combined groupBy (src endpoints count toward
    // the degree, dst endpoints only assert existence) — replaces a
    // union-distinct, a second groupBy and a join
    val base0 = e.select(col("src").as("vertex"), lit(1L).as("c"))
      .unionByName(e.select(col("dst").as("vertex"), lit(0L).as("c")))
      .groupBy(col("vertex"))
      .agg(sum(col("c")).as("_deg0"))
      .withColumn("deg", when(col("_deg0") > 0, col("_deg0"))) // dangling -> null
      .drop("_deg0")
      .transform(df => ph("materialize base")(Materialize(df)))

    // Broadcast gate sized in estimated BYTES, not rows: a 5M-vertex relation
    // with wide string keys is hundreds of MB and would OOM the driver if
    // force-broadcast by row count alone. One tiny agg over the materialized
    // base estimates the payload (key bytes + ~32B/row of numerics and
    // overhead); under the cap we ship the score relation to the edges
    // instead of shuffling the edge relation through a sort-merge join every
    // round — per-iteration work becomes map-side join + map-combined agg.
    // Past the cap (a real web graph) the shuffled join is the correct plan
    // and nothing changes. The same aggregation carries the vertex count to
    // `setup` (pageRank's 1/n init) — one sizing job, not two.
    val sizing = ph("sizing agg")(base0.agg(count(lit(1)).as("n"), coalesce(
      sum(octet_length(col("vertex").cast("string")).cast("long")), lit(0L)).as("kb")).head)
    val estBytes = sizing.getLong(1) + sizing.getLong(0) * 32L
    val broadcastScores = estBytes <= 256L * 1024 * 1024

    val (aug, initExpr, teleport) = setup(base0, sizing.getLong(0))
    val base = if (aug eq base0) base0 else {
      val m = Materialize(aug); Materialize.release(base0); m
    }
    var scores = base.withColumn("pr", initExpr)
    var prevMat: DataFrame = null
    var it = 0
    while (it < iterations) {
      // Contribution frontier: dangling vertices have nothing to send, and
      // a vertex whose score is EXACTLY 0.0 sends exactly 0.0 to every
      // out-neighbour — dropping it leaves every dst's sum bit-identical
      // (IEEE x + 0.0 == x; an all-zero in-mass arrives as the same
      // coalesce(null, 0.0) either way), so the oracle's full-join unroll
      // still matches. For personalized PageRank this is delta-style
      // propagation for free: scores start 0 everywhere but the seeds, so
      // round r joins only the <= r-hop neighbourhood of the seed set
      // instead of |V| rows — on a 100-TB graph with a handful of trust
      // seeds, early rounds touch a vanishing fraction of the corpus.
      val active = scores.where(col("deg").isNotNull && col("pr") =!= 0.0)
      val contrib = (if (broadcastScores) broadcast(active) else active)
        .join(e, col("vertex") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("deg")).as("in_mass"))
      scores = base.join(contrib.withColumnRenamed("dst", "vertex"),
        Seq("vertex"), "left")
        .withColumn("pr", round(
          teleport + lit(damping) * coalesce(col("in_mass"), lit(0.0)),
          iterScale))
        .drop("in_mass")
      if (broadcastScores && iterations > 1 && it < iterations - 1) {
        // Cut lineage every round: each round otherwise nests the previous
        // round's broadcast exchange inside its own subtree, so plan
        // analysis, codegen, and the driver's in-flight broadcast set all
        // grow with the chain. Re-measured at sf0.1 (600k edges, 16k
        // vertices, 3 rounds): per-round materialization beats the fused
        // single-plan variant BOTH one-shot (4.0s vs 4.8s — the deep nested
        // plan's analysis+codegen dominates) and steady-state (2.3s vs
        // 2.7s), and it keeps every broadcast collection O(|V|) with
        // constant-size plans at any iteration count.
        val m = ph(s"materialize round $it")(Materialize(scores))
        if (prevMat != null) Materialize.release(prevMat)
        prevMat = m
        scores = m
      }
      it += 1
    }
    val out = ph("final materialize")(
      scores.select(col("vertex"), round(col("pr"), scale).as("pagerank"))
        .transform(Materialize.apply))
    Materialize.release(e); Materialize.release(base)
    if (prevMat != null) Materialize.release(prevMat)
    out
  }

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      iterScale: Int = 9, scale: Int = 6): DataFrame =
    powerIterate(edges, srcCol, dstCol,
      setup = { (base, nVerts) =>
        val n = nVerts.toDouble // from the core's sizing aggregation
        require(n > 0, "pageRank over an empty edge list (no non-null vertices)")
        val initVal = BigDecimal(1.0 / n)
          .setScale(iterScale, BigDecimal.RoundingMode.HALF_UP).toDouble
        (base, lit(initVal), lit((1 - damping) / n))
      },
      iterations, damping, iterScale, scale)

  /** Personalized PageRank: teleport mass restarts ONLY at the `seeds`
    * (compared on the vertex's string form), so scores measure proximity
    * to the seed set — the trust/quality-propagation variant ("rank pages
    * by closeness to hand-vetted domains"). Same determinism contract as
    * [[pageRank]]: fixed iterations, per-round rounding, dangling leak. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[String], iterations: Int = 3, damping: Double = 0.85,
      iterScale: Int = 9, scale: Int = 6): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    val isSeed = col("vertex").cast("string").isin(seeds: _*)
    val seedInit = BigDecimal(1.0 / seeds.size)
      .setScale(iterScale, BigDecimal.RoundingMode.HALF_UP).toDouble
    powerIterate(edges, srcCol, dstCol,
      // the seed test is evaluated ONCE into a stored per-vertex teleport
      // column (powerIterate re-materializes the augmented base), not
      // re-evaluated in every iteration's projection
      setup = (base, _) => {
        val aug = base.withColumn("_tp",
          when(isSeed, lit((1 - damping) / seeds.size)).otherwise(lit(0.0)))
        (aug,
          when(col("_tp") > 0.0, lit(seedInit)).otherwise(lit(0.0)),
          col("_tp"))
      },
      iterations, damping, iterScale, scale)
  }

  /** Dedup clusters from a document frame + near-dup pair frame: every doc
    * mapped to its cluster id (min doc id in the component; singletons map
    * to themselves) plus a keep flag. The components frame covers only
    * vertices that appear in a pair — at corpus scale it is far smaller than
    * `docs`, so AQE turns the left join into a broadcast. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      idACol: String, idBCol: String): DataFrame = {
    val components = connectedComponentsAuto(pairs, idACol, idBCol)
      .withColumnRenamed("vertex", idCol)
    docs.select(col(idCol))
      .join(components, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }
}
