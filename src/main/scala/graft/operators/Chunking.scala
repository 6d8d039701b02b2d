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

  /** Content-defined chunks (CDC): boundaries where a `window`-char
    * polynomial rolling hash ≡ 0 (mod `divisor`), so expected chunk length
    * ≈ `divisor` chars but boundaries depend on CONTENT, not offsets —
    * inserting or deleting text early in a document leaves every
    * downstream chunk (and its hash) unchanged once the window
    * resynchronizes. Fixed-offset chunking shifts every later chunk, so
    * chunk-level dedup/provenance across document versions only works with
    * content-defined boundaries.
    *
    * Hash: rolling h = (h·257 + code) mod (2³¹−1) over a `window`-codepoint
    * ring, deterministic on any engine with the same codepoints.
    *
    * Clamps (FastCDC-style production guards, both off by default so the
    * pure content-defined form stays oracle-simple): `minLen` skips hash
    * boundaries closer than minLen to the previous cut; `maxLen` (0 = off)
    * FORCES a cut every maxLen codepoints inside longer gaps — a
    * pathological low-entropy document (megabytes of one repeated char
    * hits zero hash boundaries) can no longer become one giant chunk that
    * skews every downstream task.
    *
    * Output: id + `chunk_idx`, `chunk_start`, `chunk_end` (1-based,
    * exclusive end), `chunk_hash` (60-bit md5 of the chunk text, the
    * dedup join key). Empty texts produce zero chunks. */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 64,
      minLen: Int = 1, maxLen: Int = 0): DataFrame = {
    graft.sql.functions.ensureRegistered(df.sparkSession)
    val txt = col(textCol)
    val pairs = boundPairs(txt, window, divisor, minLen, maxLen)
    df.select(col(idCol), txt.as("__t"),
        posexplode(pairs).as(Seq("__i", "__p")))
      .select(col(idCol), col("__i").cast("long").as("chunk_idx"),
        col("__p.0").as("chunk_start"), col("__p.1").as("chunk_end"),
        Sampling.hashRank(
          col("__t").substr(col("__p.0"), col("__p.1") - col("__p.0")))
          .as("chunk_hash"))
      .where(col("chunk_end") > col("chunk_start"))
  }

  /** Consecutive CDC boundary pairs of `txt` as an `array<struct<0,1>>` —
    * the core of [[contentDefinedChunks]] (and the q100 version-diff path).
    * Bounds are strictly increasing by construction except the empty-text
    * [1,1] case (callers filter end > start). */
  private def boundPairs(txt: Column, window: Int, divisor: Int,
      minLen: Int, maxLen: Int): Column = {
    require(window >= 1, "window must be >= 1")
    require(divisor >= 1, "divisor must be >= 1")
    require(minLen >= 1, "minLen must be >= 1")
    require(maxLen == 0 || maxLen >= minLen,
      "maxLen must be 0 (unlimited) or >= minLen")
    // boundary scan is the native codegen'd expression — one tight JVM loop
    // per row over the codepoints with a ring-buffered rolling hash. The
    // pure-HOF formulations are quadratic (per-position substr re-scans the
    // UTF8 string) or interpreted-fold slow (~100× — measured 27s vs 0.3s
    // on the sf0.1 corpus); see graft.sql.CdcBounds
    val interior = call_function("graft_cdc_bounds", txt,
      lit(window), lit(divisor), lit(minLen), lit(maxLen))
    val bounds = concat(array(lit(1L)), interior,
      array((length(txt) + 1).cast("long")))
    arrays_zip(
      slice(bounds, lit(1), greatest(size(bounds) - 1, lit(0))),
      slice(bounds, lit(2), greatest(size(bounds) - 1, lit(0))))
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
