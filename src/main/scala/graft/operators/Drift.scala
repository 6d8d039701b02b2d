package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two datasets — the monitoring
  * primitive for corpus shift ("did this week's crawl change the language
  * mix / token distribution / event mix?").
  *
  * Both sides reduce to |categories|-sized count relations (map-combined
  * aggregation is the only corpus-wide shuffle); the comparison joins those
  * two small relations and attaches the three scalar totals via a broadcast
  * 1-row cross join. Laplace (+1) smoothing over the UNION of categories
  * keeps every log finite — a category seen on one side only is the whole
  * point of drift detection and must not produce ±∞.
  *
  * All arithmetic is the explicit closed form a SQL oracle can replay:
  * p_a = (n_a + 1) / (N_a + V) with V = |union categories|, N = side total.
  */
object Drift {

  /** Joined per-category counts with the three totals attached and the
    * unrounded smoothed probabilities as expressions. */
  private def smoothed(a: DataFrame, b: DataFrame, cat: Column)
      : (DataFrame, Column, Column) = {
    val ca = a.select(cat.cast("string").as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n_a"))
    val cb = b.select(cat.cast("string").as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      count(lit(1)).cast("double").as("_v"),
      sum(col("n_a")).cast("double").as("_na"),
      sum(col("n_b")).cast("double").as("_nb"))
    val pA = (col("n_a") + 1).cast("double") / (col("_na") + col("_v"))
    val pB = (col("n_b") + 1).cast("double") / (col("_nb") + col("_v"))
    (joined.crossJoin(broadcast(totals)), pA, pB)
  }

  /** Per-category drift rows: counts, smoothed probabilities and the
    * pointwise KL / PSI contributions of each category (rounded to
    * `scale`). `kl_ab_term` = p_a·ln(p_a/p_b); `psi_term` =
    * (p_a−p_b)·ln(p_a/p_b) — positive wherever the sides disagree. */
  def categoryDrift(a: DataFrame, b: DataFrame, cat: Column,
      scale: Int = 6): DataFrame = {
    val (joined, pA, pB) = smoothed(a, b, cat)
    joined
      .withColumn("p_a", round(pA, scale))
      .withColumn("p_b", round(pB, scale))
      .withColumn("kl_ab_term", round(pA * log(pA / pB), scale))
      .withColumn("kl_ba_term", round(pB * log(pB / pA), scale))
      .withColumn("psi_term", round((pA - pB) * log(pA / pB), scale))
      .drop("_v", "_na", "_nb")
  }

  /** One-row drift summary over a categorical expression: KL(A‖B),
    * KL(B‖A), Jensen–Shannon divergence (symmetric, bounded by ln 2) and
    * the population stability index. Sums run over the UNROUNDED smoothed
    * probabilities; only the four summary scalars round. */
  def driftSummary(a: DataFrame, b: DataFrame, cat: Column,
      scale: Int = 6): DataFrame = {
    val (joined, pA, pB) = smoothed(a, b, cat)
    val m = (pA + pB) / 2
    joined.agg(
      round(sum(pA * log(pA / pB)), scale).as("kl_ab"),
      round(sum(pB * log(pB / pA)), scale).as("kl_ba"),
      round(sum(pA * log(pA / m) / 2 + pB * log(pB / m) / 2), scale).as("js"),
      round(sum((pA - pB) * log(pA / pB)), scale).as("psi"))
  }

  /** Mutual information (nats) between two categorical expressions — the
    * feature-selection signal for categorical pairs (the numeric
    * correlation scan's counterpart). I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
    * over the OBSERVED joint distribution: no smoothing needed, since an
    * observed cell implies both marginals are positive — every log is
    * finite. Output one row: n, `mi`, and `nmi` = I/√(H(x)·H(y)) in [0,1]
    * (null when either variable is constant).
    *
    * Scale shape: ONE corpus-wide shuffle builds the joint counts;
    * marginals, totals and entropies all derive from that cell-sized
    * relation without rescanning the data. */
  def mutualInformation(df: DataFrame, x: Column, y: Column,
      scale: Int = 6): DataFrame = {
    val joint = Materialize(
      df.select(x.cast("string").as("x"), y.cast("string").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy")))
    val nx = joint.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val ny = joint.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val tot = joint.agg(sum(col("nxy")).cast("double").as("n"))
    // ONE aggregation pass over the enriched cells computes MI and BOTH
    // marginal entropies: Σ_{cells of x} nxy = nx turns the per-x entropy
    // term into per-cell weights, so no separate hx/hy jobs and no extra
    // scalar cross-joins — fewer jobs over the same cell-sized relation
    joint.join(nx, Seq("x")).join(ny, Seq("y"))
      .crossJoin(broadcast(tot))
      .agg(
        first(col("n")).as("n"),
        sum((col("nxy") / col("n"))
          * log(col("nxy") * col("n") / (col("nx") * col("ny")))).as("_mi"),
        (-sum((col("nxy") / col("n")) * log(col("nx") / col("n")))).as("hx"),
        (-sum((col("nxy") / col("n")) * log(col("ny") / col("n")))).as("hy"))
      .select(
        col("n").cast("long").as("n"),
        round(col("_mi"), scale).as("mi"),
        when(col("hx") > 1e-12 && col("hy") > 1e-12,
          round(col("_mi") / sqrt(col("hx") * col("hy")), scale)).as("nmi"))
  }

  /** Token-distribution drift between two document corpora: tokenize both
    * sides (lowercased whitespace tokens) and compare via [[driftSummary]]
    * — "has the vocabulary shifted between these two crawls?". */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
      scale: Int = 6): DataFrame = {
    def toks(df: DataFrame) = df.select(
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("tok"))
    driftSummary(toks(a), toks(b), col("tok"), scale)
  }
}
