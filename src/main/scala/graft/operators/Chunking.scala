package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split long texts into fixed-size training/context
  * windows, optionally overlapping (stride < window).
  *
  * Both variants are pure narrow maps — `sequence` + `explode` + slicing,
  * no shuffle, no UDF — so a 100 TB chunking pass inherits the scan's
  * partitioning and stays inside whole-stage codegen. Chunk indexes are
  * derived arithmetically from the start offset (`start / stride`), not
  * from explode ordering, so results are deterministic under any
  * partitioning or retry.
  *
  * Empty/null texts produce ZERO chunks (they explode over an empty start
  * array), mirroring the n-gram operators' empty-doc semantics
  * (Dedup.gramHashUdf): a blank document contributes nothing downstream.
  */
object Chunking {

  /** Character-window chunks: `size` chars every `stride` chars.
    * Output: id columns + `chunk_ix`, `chunk_start`, `chunk_len`,
    * `chunk_text`. The final chunk may be shorter than `size`. */
  def chunkChars(df: DataFrame, idCols: Seq[String], textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0, "size must be positive")
    require(stride > 0 && stride <= size, "stride must be in [1, size]")
    val len = coalesce(length(col(textCol)), lit(0))
    val starts = when(len === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), len - 1, lit(stride)))
    val text = col(textCol).substr(col("chunk_start") + 1, lit(size))
    df.withColumn("chunk_start", explode(starts))
      .withColumn("chunk_ix", (col("chunk_start") / stride).cast("long"))
      .withColumn("chunk_text", text)
      .select(idCols.map(col) ++ Seq(
        col("chunk_ix"), col("chunk_start").cast("long").as("chunk_start"),
        length(col("chunk_text")).cast("long").as("chunk_len"),
        col("chunk_text")): _*)
  }

  /** Token-window chunks: `windowTokens` whitespace tokens every
    * `strideTokens`, re-joined with single spaces (the LLM-pipeline shape:
    * context windows over token streams, overlap preserving boundary
    * context). Output: id columns + `chunk_ix`, `tok_start`, `n_tokens`,
    * `chunk_text`. */
  def chunkTokens(df: DataFrame, idCols: Seq[String], textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "strideTokens must be in [1, windowTokens]")
    val toks = filter(split(coalesce(col(textCol), lit("")), "\\s+"),
      t => t =!= "")
    val nTok = size(toks)
    val starts = when(nTok === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nTok - 1, lit(strideTokens)))
    df.withColumn("_toks", toks)
      .withColumn("tok_start", explode(starts))
      .withColumn("chunk_ix", (col("tok_start") / strideTokens).cast("long"))
      .withColumn("_chunk", slice(col("_toks"), col("tok_start") + 1, lit(windowTokens)))
      .select(idCols.map(col) ++ Seq(
        col("chunk_ix"), col("tok_start").cast("long").as("tok_start"),
        size(col("_chunk")).cast("long").as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text")): _*)
  }
}
