package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boilerplate-line removal — the Common-Crawl-style curation step: a line
  * that appears in most documents of a group (a domain's navigation,
  * cookie banner, footer) carries no signal and poisons dedup and LM
  * training; strip it from EVERY document of that group while preserving
  * the order of what remains.
  *
  * Scale shape: lines explode once; the frequency pass counts DISTINCT
  * documents per (group, line-hash) — hashes, not line strings, ride the
  * counting shuffle — and the boilerplate subset joins back against the
  * exploded lines as an anti-join whose strategy AQE picks from the
  * RUNTIME size: usually a broadcast (few frequent lines), but a web-scale
  * corpus with millions of groups can exceed the broadcast budget, where a
  * forced hint would OOM and AQE correctly shuffles instead. The rebuild
  * is one groupBy(doc) with an in-row sort of (pos, line) pairs.
  */
object Boilerplate {

  /** Strip lines occurring in more than `maxDocFrac` of a group's
    * documents, for groups with at least `minDocs` documents (below that
    * a "frequent" line is noise, not boilerplate). Returns one row per
    * input document: (idCol, groupCol, `textCol` cleaned) — a document
    * whose every line was boilerplate keeps an empty string. Line = a
    * `\n`-separated segment; blank lines are preserved unless frequent
    * like any other line. */
  def stripBoilerplate(docs: DataFrame, idCol: String, groupCol: String,
      textCol: String, maxDocFrac: Double = 0.5, minDocs: Long = 5L): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac <= 1, s"maxDocFrac in (0,1], got $maxDocFrac")
    val lines = docs.select(col(idCol).as("__id"), col(groupCol).as("__grp"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val groupDocs = docs.groupBy(col(groupCol).as("__grp"))
      .agg(countDistinct(col(idCol)).as("__docs"))
    // hashes-only counting shuffle; the md5 keys the join back too
    val lineDocCounts = lines
      .select(col("__grp"), col("__id"), md5(col("__line")).as("__lh"))
      .distinct()
      .groupBy(col("__grp"), col("__lh"))
      .agg(count(lit(1)).as("__in_docs"))
    val boiler = lineDocCounts.join(groupDocs, Seq("__grp"))
      .where(col("__docs") >= minDocs &&
        col("__in_docs").cast("double") > col("__docs").cast("double") * maxDocFrac)
      .select(col("__grp"), col("__lh"))
    val kept = lines
      .withColumn("__lh", md5(col("__line")))
      .join(boiler, Seq("__grp", "__lh"), "left_anti")
    val rebuilt = kept.groupBy(col("__id"), col("__grp"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        "\n").as("__text"))
    // a doc whose every line stripped vanishes from the groupBy — restore
    // it with an empty text rather than silently dropping the row
    docs.select(col(idCol).as("__id"), col(groupCol).as("__grp"))
      .join(rebuilt, Seq("__id", "__grp"), "left")
      .select(col("__id").as(idCol), col("__grp").as(groupCol),
        coalesce(col("__text"), lit("")).as(textCol))
  }
}
