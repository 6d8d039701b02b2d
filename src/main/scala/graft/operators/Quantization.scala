package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the standard memory
  * path for vector search at 100 TB (an IVF-PQ index stores m one-byte codes
  * per vector instead of dim floats: 64-dim float32 → 4 bytes of codes is a
  * 64x compression).
  *
  * The vector space splits into `m` contiguous subspaces; each learns a
  * small k-means codebook over its subvectors; a vector's code is the
  * per-subspace nearest-centroid index. Asymmetric-distance search (ADC)
  * scores query-to-code distances through the codebooks without ever
  * reconstructing corpus vectors.
  *
  * Determinism contract (what makes the correctness gate able to verify
  * codes against a SQL oracle, like [[Similarity.ivfTopK]]): codebook init =
  * subvectors of the first k vectors in id order; Lloyd assignment uses
  * strict-< argmin (first minimum wins); centroid update is the per-dim
  * mean; empty cells keep their previous centroid.
  *
  * Scale design: training collects only (m x k x subDim) doubles to the
  * driver — never corpus-sized. Encoding is one map-side pass; ADC search
  * is a broadcast of (queries x m x k) distance tables against a scan of
  * the coded corpus.
  */
object Quantization {

  /** Learned PQ model: codebooks(j)(c) = centroid c of subspace j. */
  final case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length

    /** Persist as one tiny parquet (m*k rows of (j, c, centroid)) so a
      * model trains once and encodes in any later job/session — retraining
      * per job would silently shift codes and corrupt an incrementally
      * coded corpus. */
    def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
      import spark.implicits._
      codebooks.zipWithIndex.flatMap { case (cb, j) =>
        cb.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
      }.toSeq.toDF("j", "c", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  /** Load a [[PqModel]] written by [[PqModel.save]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("j"), col("c"), col("centroid"))
      .as[(Int, Int, Seq[Double])].collect()
    require(rows.nonEmpty, s"no PQ model at $path")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (j, c, cent) => codebooks(j)(c) = cent.toArray }
    require(codebooks.forall(_.forall(_ != null)), s"PQ model at $path is incomplete")
    PqModel(codebooks.head.head.length, codebooks)
  }

  private[operators] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Indices of the `nProbe` nearest centroids to `v` (squared-L2,
    * deterministic tie-break by cell index) with the loud dim-drift
    * contract — ONE definition behind every IVF probe UDF (AnnIndex raw +
    * PQ, ivfPqTopK, Similarity.ivfTopK), so a probe-semantics fix can
    * never diverge the paths. */
  private[operators] def nearestCells(cents: Array[Array[Double]],
      v: Array[Double], nProbe: Int): Array[Int] = {
    require(cents.isEmpty || v.length == cents(0).length,
      s"query vector dim ${v.length} does not match trained centroid " +
        s"dim ${cents(0).length} — re-encode queries or rebuild the index")
    cents.indices.map(ci => (sqDist(v, cents(ci)), ci))
      .sorted.take(nProbe).map(_._2).toArray
  }

  /** [[nearestCells]] plus the per-cell query RESIDUAL (IVF-PQ scores ADC
    * in each probed cell's residual space). */
  private[operators] def nearestCellsWithResiduals(cents: Array[Array[Double]],
      v: Array[Double], nProbe: Int): Array[(Long, Array[Double])] =
    nearestCells(cents, v, nProbe).map { ci =>
      val cent = cents(ci)
      val res = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { res(i) = v(i) - cent(i); i += 1 }
      (ci.toLong, res)
    }

  /** Shared ADC scoring tail — m table lookups per candidate, rounded
    * distance, id tie-break (the module's determinism contract in ONE
    * place; it was copy-pasted across adcTopK / ivfPqTopK / the persisted
    * shortlist and would silently break oracle parity if the copies
    * drifted). `joined` must carry query_id, neighbor_id, table_j, code_j. */
  private[operators] def adcRank(joined: DataFrame, m: Int, k: Int,
      scale: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = (0 until m).map { j =>
      element_at(col(s"table_$j"), col(s"code_$j").cast("int") + 1)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    joined.where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", round(dist, scale))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank").cast("long").as("rank"))
  }

  private def argminCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var ci = 0
    while (ci < cents.length) {
      val d = sqDist(v, cents(ci))
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  /** Train per-subspace codebooks with `lloydIters` rounds of Lloyd's
    * algorithm. `dim` must split evenly into `m` subspaces. */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 4,
      k: Int = 8,
      lloydIters: Int = 1,
      preMaterialized: Boolean = false): PqModel = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val subDim = dim / m
    // read once per Lloyd round, not per subspace; callers that already
    // materialized the input (IVF-PQ's residual frame) skip the second
    // corpus-sized checkpoint
    val c0 = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val c = if (preMaterialized) c0 else Materialize(c0)

    // init: subvectors of the first k vectors by id — one tiny collect
    val seed = c.orderBy(col("vid")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(seed.length >= k,
      s"PQ train needs at least k=$k vectors, corpus has ${seed.length}")
    seed.find(_.length != dim).foreach(v => throw new IllegalArgumentException(
      s"PQ train: vector of dim ${v.length} does not match declared dim=$dim"))
    var codebooks = Array.tabulate(m, k)((j, ci) =>
      java.util.Arrays.copyOfRange(seed(ci), j * subDim, (j + 1) * subDim))

    var it = 0
    while (it < lloydIters) {
      val cb = codebooks
      val assignAll = array((0 until m).map(j =>
        subvecCode(c.sparkSession, cb(j), j * subDim, dim)(col("v"))): _*)
      // one aggregation job refreshes every subspace: rows explode to
      // (subspace, cell, pos, x) and reduce to per-centroid means
      val updated = c.withColumn("cells", assignAll)
        .select(posexplode(col("v")).as(Seq("p", "x")), col("cells"))
        .select((col("p") / subDim).cast("int").as("j"),
          (col("p") % subDim).cast("int").as("pos"),
          element_at(col("cells"), (col("p") / subDim).cast("int") + 1).as("cell"),
          col("x"))
        .groupBy("j", "cell", "pos").agg(avg(col("x")).as("mean"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      // cells with no members never appear in `updated` -> keep previous
      codebooks = next
      it += 1
    }
    if (!preMaterialized) Materialize.release(c)
    PqModel(subDim, codebooks)
  }

  /** Per-subspace nearest-centroid code via the native codegen'd
    * [[graft.sql.SubvecAssign]] expression: each codebook rides into the
    * generated code ONCE as a double[][] reference and the subvector is
    * read from ArrayData IN PLACE — the former Scala-UDF encoder paid a
    * full Array[Double] copy per row at the serialization boundary plus a
    * copyOfRange per subspace, pure overhead on a corpus-scale encode.
    * Fails loudly when the vector length differs from `expectDim` (the
    * UDF's dim-drift contract, now enforced inside the expression). */
  private def subvecCode(spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Double]], offset: Int, expectDim: Int)(v: Column): Column = {
    graft.sql.functions.ensureRegistered(spark)
    call_function("graft_subvec_assign", v.cast("array<double>"),
      typedLit(codebook.map(_.toSeq).toSeq), lit(offset), lit(expectDim))
  }

  /** Per-subspace nearest-centroid codes as one map-side pass:
    * (idCol, passthrough..., code_0 .. code_{m-1}) — integer output, exactly
    * reproducible by any engine that replays the training recurrence.
    * `passthrough` columns ride along so callers (IVF-PQ keeps its cell id)
    * never need a corpus-wide re-join to recover them. One codegen'd
    * [[graft.sql.SubvecAssign]] per subspace; the m argmins stay inside the
    * same whole-stage-codegen projection (subexpression elimination shares
    * the input array across them). */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: PqModel,
      passthrough: Seq[String] = Seq.empty): DataFrame = {
    val reserved = "codes" +: (0 until model.m).map(j => s"code_$j")
    require((idCol +: passthrough).forall(c => !reserved.contains(c)),
      s"idCol/passthrough may not use the reserved names ${reserved.mkString(", ")}")
    val subDim = model.subDim
    val m = model.m
    df.select((idCol +: passthrough).map(col) ++
      (0 until m).map { j =>
        subvecCode(df.sparkSession, model.codebooks(j), j * subDim, m * subDim)(
          col(vecCol)).cast("long").as(s"code_$j")
      }: _*)
  }

  /** Append per-row distance TABLES `table_0 .. table_{m-1}` (m x k doubles,
    * computed once per row on the broadcast side) over the vector column —
    * the "asymmetric" trick: scoring a corpus vector is then m table
    * lookups + (m-1) adds, independent of dim. */
  private[graft] def withDistTables(df: DataFrame, vecColName: String,
      model: PqModel): DataFrame = {
    val subDim = model.subDim
    (0 until model.m).foldLeft(df) { (acc, j) =>
      val cbLit = array(model.codebooks(j).toIndexedSeq.map(cent =>
        array(cent.toIndexedSeq.map(lit): _*)): _*)
      val qSub = slice(col(vecColName), j * subDim + 1, subDim)
      acc.withColumn(s"table_$j", transform(cbLit, cent =>
        aggregate(
          zip_with(qSub, cent, (x, y) => (x - y) * (x - y)),
          lit(0.0), (accum, v) => accum + v)))
    }
  }

  /** Asymmetric-distance top-k: squared-L2 from each query to each coded
    * corpus vector, summed over subspaces through the codebooks. The coded
    * corpus streams (never reconstructed); queries broadcast. Rounded
    * distance + id tie-break keeps ranking engine-stable. */
  def adcTopK(
      codedCorpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel,
      k: Int,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = model.m
    val rawQ = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    // loud dim-drift contract (same as every other query path): a short
    // query would null-pad through zip_with, making adc_dist NULL — which
    // the ascending sort ranks FIRST, silently topping k with garbage.
    // Checked LAZILY in the plan (like AuditTable.append's null guard), so
    // building the query costs no extra scan and plan-only contexts
    // (explain/PlanDump) never execute a job; the error fires on execution.
    val expectDim = model.subDim * m
    // coalesce in the message: a NULL q_vec would null-propagate through
    // concat and raise a MESSAGE-LESS error (size(NULL) = NULL)
    val qs = rawQ.withColumn("q_vec",
      when(size(col("q_vec")) === expectDim, col("q_vec"))
        .otherwise(raise_error(concat(
          lit("adcTopK: query vector of dim "),
          coalesce(size(col("q_vec")).cast("string"), lit("NULL")),
          lit(s" does not match the PQ model's $expectDim — " +
            "re-encode queries or retrain")))))
    val tabled = withDistTables(qs, "q_vec", model)
    val q = broadcast(tabled)
    // adcRank computes the same doubles as per-subspace distances in place
    // (identical per-element ops and fold order) — the SQL oracle matches
    adcRank(q.crossJoin(codedCorpus.withColumnRenamed(idCol, "neighbor_id")),
      m, k, scale)
  }

  /** IVF-PQ composite search (the FAISS `IVFPQ` shape, as DataFrame ops):
    * coarse k-means cells prune the corpus to `nProbe` inverted lists per
    * query, and within a cell the RESIDUAL (vector minus its cell centroid)
    * is product-quantized — residual encoding is what makes small codebooks
    * accurate, because each subspace only has to cover the spread around a
    * centroid, not the whole space.
    *
    * Search: each query expands to its `nProbe` nearest cells, builds one
    * residual distance table per probed cell on the broadcast side, and
    * scores ONLY that cell's codes via table lookups — corpus cost is
    * |probed lists| x m lookups, never dim-sized math, and the coded corpus
    * (cell + m small ints per vector) is the only thing scanned.
    *
    * Deterministic end to end (seeded coarse + PQ k-means, strict-< argmin,
    * rounded distance, id tie-break). Ranking quality is spec-tested for
    * recall against exact L2 top-k (ADC approximates squared-L2 — cosine
    * rankings like [[Similarity.bruteForceTopK]] are a different metric on
    * unnormalised vectors).
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nLists: Int = 16,
      coarseIters: Int = 2,
      nProbe: Int = 2,
      m: Int = 4,
      codesPerSubspace: Int = 8,
      pqIters: Int = 1,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("c_vec"))
      .transform(Materialize.apply) // coarse rounds + residual encode reread it

    val coarse = Similarity.kmeansCentroids(c, "neighbor_id", "c_vec", nLists, coarseIters)
    // one pass derives (cell, residual) via the native cell-assign +
    // centroid-sub expression pair; PQ trains and encodes on residuals
    val withRes = c
      .transform(Similarity.withCellAndResidual(corpus.sparkSession, coarse, "c_vec"))
      .select(col("neighbor_id"), col("cell"), col("res"))
      .transform(Materialize.apply)
    val model = train(withRes, "neighbor_id", "res", dim, m, codesPerSubspace,
      pqIters, preMaterialized = true)
    // cell rides through the encode projection — no corpus-wide re-join
    val coded = encode(withRes, "neighbor_id", "res", model, passthrough = Seq("cell"))

    // queries: explode to nProbe probed cells, each with its own residual —
    // the distance tables below are PER (query, cell)
    val probeUdf = udf { (v: Array[Double]) =>
      nearestCellsWithResiduals(coarse, v, nProbe) // shared loud dim guard
    }
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
      .where(col("q_vec").isNotNull) // skip null queries, don't NPE
      .withColumn("_probe", explode(probeUdf(col("q_vec"))))
      .select(col("query_id"), col("_probe._1").as("cell"), col("_probe._2").as("q_res"))
    val tabled = broadcast(withDistTables(q, "q_res", model))

    val out = adcRank(tabled.join(coded, Seq("cell")), m, k, scale)
      // queries x k rows — materializing the (tiny) result lets BOTH
      // corpus-sized intermediates release immediately instead of leaking
      // replicated cache entries for the session (persist mode contract)
      .transform(Materialize.apply)
    Materialize.release(withRes)
    Materialize.release(c)
    out
  }

  /** Per-dimension scalar int8 quantization of an embedding column — the
    * 4× storage/bandwidth compressor every vector store applies before
    * anything fancier (PQ is per-SUBSPACE; this is the per-DIMENSION affine
    * baseline): code_i = clamp(floor((v_i − min_i)/(max_i − min_i)·255)) −
    * 128, plus the per-vector reconstruction MSE at the dequantized
    * midpoint — the measurement that says whether int8 is safe for a given
    * corpus or the range needs outlier-clipping first.
    *
    * Scale shape: dimension ranges are ONE map-combined (dim, min, max)
    * aggregation (≤ dim groups survive the combine) packed into a 1-row
    * broadcast; coding is then a pure narrow map over the corpus. All
    * arithmetic is float→double promoted before subtraction and folded in
    * element order, so codes and MSE are bit-reproducible in any IEEE
    * engine. Output: (id, codes array<int>, mse). */
  def int8Quantize(emb: DataFrame, idCol: String, vecCol: String,
      scale: Int = 9): DataFrame = {
    // dimension count first (a size-only scan), then the range stats as
    // 2·dim min/max aggregates over the UNEXPLODED rows — min/max are
    // order-independent, so this is bit-identical to the former
    // posexplode + groupBy(dim) formulation without the dim× row
    // amplification; ragged shorter vectors contribute null (ignored) at
    // the dims they lack, exactly as their exploded rows were absent —
    // try_element_at, because ANSI element_at past the array end THROWS
    val dimRow = emb.agg(max(size(col(vecCol)))).head()
    require(!dimRow.isNullAt(0) && dimRow.getInt(0) > 0,
      s"int8Quantize over empty/null '$vecCol' arrays")
    val dim = dimRow.getInt(0)
    val packed = emb.agg(
      array((0 until dim).map(i =>
        min(try_element_at(col(vecCol), lit(i + 1))).cast("double")): _*).as("__mins"),
      array((0 until dim).map(i =>
        max(try_element_at(col(vecCol), lit(i + 1))).cast("double")): _*).as("__maxs"))
    // ONE native fused loop per row (graft_int8_quant, round 14): codes +
    // MSE together. The former per-element HOF chain (two `transform`s +
    // an `aggregate`, all interpreted, the code expression evaluated twice
    // per dimension) was the dominant q113 cost at sf1; the kernel is
    // spec-pinned bit-identical, null/NaN quirks included. Squared error
    // via d*d, not pow(d, 2): multiplication is correctly rounded — keeps
    // MSE engine-exact. Zero-length/null vectors are guarded here (empty
    // codes + null mse, the row stays visible for triage); the kernel
    // divides by n, rounding stays engine-comparable out here.
    graft.sql.functions.ensureRegistered(emb.sparkSession)
    val n = size(col(vecCol))
    val q = call_function("graft_int8_quant",
      col(vecCol), col("__mins"), col("__maxs"))
    emb.crossJoin(broadcast(packed))
      .select(col(idCol).as("id"),
        when(n > 0, q.getField("codes"))
          .otherwise(typedLit(Seq.empty[Int])).as("codes"),
        when(n > 0, round(q.getField("mse"), scale)).as("mse"))
  }
}
