package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.io.{InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.Properties
import scala.jdk.CollectionConverters._

/** Table-level metadata persisted beside the data as a java-properties file
  * (`.table_info`), on-disk compatible with the reference
  * (/root/reference/waimak-storage/.../FileStorageOps.scala:269-307). */
final case class AuditTableInfo(
    tableName: String,
    primaryKeys: Seq[String],
    meta: Map[String, String],
    retainHistory: Boolean)

/** One physical region of an audit table: a hot (fresh append) or cold
  * (compacted) parquet folder, plus its stats. */
final case class AuditTableRegionInfo(
    tableName: String,
    storeType: String, // "hot" | "cold"
    storeRegion: String, // zero-padded sequence id
    createdOn: java.sql.Timestamp,
    isDeprecated: Boolean,
    count: Long,
    maxLastUpdated: java.sql.Timestamp)

/** Filesystem + parquet primitives for the storage layer: atomic folder
  * moves via staging, mergeSchema multi-path opens, `.table_info`
  * round-trip, Trash with age-based purge.
  *
  * All writes stage into `.tmp` then `rename` — O(1) and atomic on
  * HDFS-like filesystems, so readers never observe partial regions.
  */
class FileStorageOps(spark: SparkSession, fsBase: Option[Path] = None) {

  /** Resolved from the storage base path when given: a warehouse on a
    * non-default scheme (s3a:// under an hdfs:// default FS) otherwise
    * fails every metadata/trash/bloom operation with "Wrong FS" while the
    * Spark reads themselves work — the reference resolves from the base
    * path for the same reason. */
  lazy val fs: FileSystem = fsBase
    .map(_.getFileSystem(spark.sparkContext.hadoopConfiguration))
    .getOrElse(FileSystem.get(spark.sparkContext.hadoopConfiguration))

  /** Open N region paths as one DataFrame with schema evolution. */
  def openParquet(paths: Seq[Path]): Option[DataFrame] = {
    val existing = paths.filter(fs.exists)
    if (existing.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(existing.map(_.toString): _*))
  }

  /** Write parquet into `dest` atomically: stage under `<base>/.tmp`, then
    * move over. */
  def writeParquet(base: Path, relDest: String, df: DataFrame,
      overwrite: Boolean = true): Path = {
    // staging is per-attempt unique: two UNCOORDINATED writers racing the
    // same destination (e.g. two processes allocating the same region id)
    // must never share a staging dir, or one could publish the other's
    // half-written data — with unique staging the loser fails cleanly at
    // the rename below instead
    val staging = new Path(base,
      s".tmp/$relDest-${java.util.UUID.randomUUID.toString.take(8)}")
    val dest = new Path(base, relDest)
    // far-future timestamps (SQL Server temporal validity ends, warehouse
    // open-interval sentinels like 9999-12-31) overflow Spark 4's default
    // parquet timestamp[ns] int64 and silently wrap to 1816 — storage
    // regions always write µs; the guard is depth-counted so the user's
    // session conf is restored only after the LAST concurrent storage
    // write (the parallel executor runs appends on several threads — a
    // naive save/restore would let one thread's finally strip the µs
    // setting while another thread is still planning its write)
    FileStorageOps.withMicrosTimestamps(spark) {
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    }
    // CRASH CONTRACT: a process killed here (data staged, not yet
    // published) leaves only an orphan under .tmp — the destination is
    // untouched, so readers are unaffected and a retry on a fresh handle
    // simply re-stages; [[sweepStaleStaging]] reclaims the orphan's bytes
    // (CrashRecoverySpec pins all of this)
    crashPoint("publish.staged")
    // a losing/FAILED publish (this process survives the exception) must
    // not leak its full parquet copy under .tmp forever (unique staging
    // dirs are never reused, so nothing else will ever clean them) —
    // delete before rethrowing
    try moveOverwriteFolder(staging, dest, overwrite)
    catch {
      case e: Throwable =>
        try fs.delete(staging, true)
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
    dest
  }

  /** Fault-injection seam (round-13 verdict item 7): invoked at the named
    * crash-relevant instants of the publish/compact/trash lifecycle.
    * Production is a no-op; CrashRecoverySpec overrides it to simulate a
    * process KILLED at exactly that point (throwing here skips every
    * cleanup a surviving process would run — which is the point). */
  protected[storage] def crashPoint(name: String): Unit = ()

  /** Reclaim staging orphans left under `<base>/.tmp` by CRASHED writers
    * (a process killed between staging and publish — a surviving process
    * cleans up after itself in [[writeParquet]]). Only staging LEAVES (the
    * `-<uuid8>`-suffixed folders writeParquet creates) older than
    * `maxAgeMs` are deleted: an ACTIVE writer keeps its leaf's mtime fresh
    * by writing part files into it, while intermediate `.tmp` dirs carry
    * no age signal of their own (a nested create does not touch their
    * mtime) and so are never used as a deletion root. Called best-effort
    * from table open and from compact — the storage layer's janitor
    * moments. */
  def sweepStaleStaging(base: Path, nowMs: Long, maxAgeMs: Long): Unit = {
    val tmpRoot = new Path(base, ".tmp")
    def walk(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) {
          if (st.getPath.getName.matches(".*-[0-9a-f]{8}")) {
            if (nowMs - st.getModificationTime > maxAgeMs)
              fs.delete(st.getPath, true): Unit
          } else walk(st.getPath)
        }
      }
    if (fs.exists(tmpRoot)) walk(tmpRoot)
  }

  def moveOverwriteFolder(from: Path, to: Path, overwrite: Boolean = true): Unit = {
    if (fs.exists(to)) {
      if (!overwrite) throw new StorageException(s"Destination already exists: $to")
      fs.delete(to, true)
    }
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to))
      throw new StorageException(s"Failed to move $from to $to")
  }

  // ------------------------------------------------------------ metadata ---

  def writeTableInfo(tablePath: Path, info: AuditTableInfo): Unit = {
    val props = new Properties()
    props.setProperty("table_name", info.tableName)
    props.setProperty("primary_keys", info.primaryKeys.mkString("|"))
    props.setProperty("retain_history", info.retainHistory.toString)
    info.meta.foreach { case (k, v) => props.setProperty(s"meta.$k", v) }
    val out = fs.create(new Path(tablePath, ".table_info"), true)
    val writer = new OutputStreamWriter(out, StandardCharsets.UTF_8)
    try props.store(writer, s"audit table info for ${info.tableName}")
    finally writer.close()
  }

  def readTableInfo(tablePath: Path): Option[AuditTableInfo] = {
    val p = new Path(tablePath, ".table_info")
    if (!fs.exists(p)) None
    else {
      val props = new Properties()
      val in = new InputStreamReader(fs.open(p), StandardCharsets.UTF_8)
      try props.load(in) finally in.close()
      val meta = props.stringPropertyNames().asScala
        .filter(_.startsWith("meta."))
        .map(k => k.stripPrefix("meta.") -> props.getProperty(k)).toMap
      Some(AuditTableInfo(
        props.getProperty("table_name"),
        Option(props.getProperty("primary_keys")).filter(_.nonEmpty)
          .map { raw =>
            val pks = raw.split("\\|").toSeq
            // migration shim: pre-pipe-format files stored composite keys
            // comma-separated; column names never contain commas, so a
            // single "|"-token holding commas is unambiguously the old format
            if (pks.lengthIs == 1 && pks.head.contains(",")) pks.head.split(",").toSeq
            else pks
          }.getOrElse(Seq.empty),
        meta,
        Option(props.getProperty("retain_history")).forall(_.toBoolean)))
    }
  }

  // -------------------------------------------------------- region cache ---

  /** Persist region stats to `<base>/.regioninfo/<table>` so reopening a
    * table needs no parquet scan over its regions (the reference keeps the
    * same cache as a coalesce(1) parquet file — here it is a plain text
    * file written through the FS API: zero Spark jobs on the mutation path,
    * identical validation semantics). Written atomically via temp+rename. */
  def writeRegionInfoCache(base: Path, tableName: String,
      regions: Seq[AuditTableRegionInfo]): Unit = {
    val dir = new Path(base, ".regioninfo")
    fs.mkdirs(dir)
    // unique temp name: concurrent writers must not clobber each other's
    // staging file (last rename wins; both outcomes are valid caches)
    val tmp = new Path(dir, s".$tableName.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    val w = new OutputStreamWriter(out, StandardCharsets.UTF_8)
    try regions.foreach { r =>
      w.write(Seq(r.storeType, r.storeRegion, r.createdOn.getTime.toString,
        r.isDeprecated.toString, r.count.toString, r.maxLastUpdated.getTime.toString)
        .mkString("|"))
      w.write("\n")
    } finally w.close()
    val dest = new Path(dir, tableName)
    if (fs.exists(dest)) fs.delete(dest, false)
    // best-effort publish: the cache is ADVISORY (a stale or missing file
    // is detected against the folder layout and rebuilt). On HDFS-like
    // filesystems a concurrent reader's cache rebuild can win the rename
    // race; failing HERE would surface as a failed append/compact AFTER
    // the data region is already live, making the caller retry and
    // duplicate data.
    if (!fs.rename(tmp, dest))
      scala.util.Try(fs.delete(tmp, false))
  }

  def readRegionInfoCache(base: Path, tableName: String): Option[Seq[AuditTableRegionInfo]] = {
    val p = new Path(base, s".regioninfo/$tableName")
    if (!fs.exists(p)) None
    else {
      val in = new java.io.BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
      try {
        val lines = Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
        Some(lines.filter(_.nonEmpty).map { line =>
          val f = line.split("\\|", -1)
          AuditTableRegionInfo(tableName, f(0), f(1),
            new java.sql.Timestamp(f(2).toLong), f(3).toBoolean, f(4).toLong,
            new java.sql.Timestamp(f(5).toLong))
        })
      } catch {
        case _: Exception => None // corrupt cache -> caller rebuilds from a scan
      } finally in.close()
    }
  }

  // --------------------------------------------------------------- trash ---

  /** Move region folders into `<base>/.Trash/<table>/<epochMillis>/` instead
    * of deleting — compaction stays rollback-able until the purge. */
  def moveToTrash(base: Path, tableName: String, regions: Seq[Path],
      nowMs: Long): Unit = {
    val trashDir = new Path(base, s".Trash/$tableName/$nowMs")
    fs.mkdirs(trashDir)
    regions.foreach { r =>
      if (!fs.rename(r, new Path(trashDir, r.getName)))
        throw new StorageException(s"Failed to trash region $r")
      // CRASH CONTRACT: killed mid-loop = some inputs trashed, some still
      // live beside the already-published merge output. A fresh open
      // rebuilds regions from the folder layout (the cache no longer
      // matches), so reads stay consistent at snapshot level — PK dedup
      // collapses the survivors' duplicates — and the next completed
      // compaction re-merges and trashes the stragglers
      crashPoint("trash.moved")
    }
  }

  /** Delete trash snapshots older than `maxAgeMs`. */
  def purgeTrash(base: Path, tableName: String, nowMs: Long, maxAgeMs: Long): Unit = {
    val tableTrash = new Path(base, s".Trash/$tableName")
    if (fs.exists(tableTrash)) {
      fs.listStatus(tableTrash).foreach { st =>
        val ts = scala.util.Try(st.getPath.getName.toLong).getOrElse(Long.MaxValue)
        if (nowMs - ts > maxAgeMs) fs.delete(st.getPath, true)
      }
    }
  }

  def listDirs(path: Path): Seq[Path] =
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).filter(_.isDirectory).map(_.getPath).toSeq
}

object FileStorageOps {

  private val MicrosKey = "spark.sql.parquet.outputTimestampType"
  // per-session reentrancy state: (active writer count, conf value to restore)
  private val micros =
    scala.collection.mutable.Map.empty[SparkSession, (Int, Option[String])]

  /** Run `f` with parquet timestamps pinned to µs on `spark`'s session
    * conf, concurrency-safe: the first concurrent entrant saves and sets,
    * the last restores. */
  private[storage] def withMicrosTimestamps[T](spark: SparkSession)(f: => T): T = {
    micros.synchronized {
      micros.get(spark) match {
        case Some((n, saved)) => micros.update(spark, (n + 1, saved))
        case None =>
          val saved = spark.conf.getOption(MicrosKey)
          spark.conf.set(MicrosKey, "TIMESTAMP_MICROS")
          micros.update(spark, (1, saved))
      }
    }
    try f
    finally micros.synchronized {
      micros(spark) match {
        case (1, saved) =>
          micros.remove(spark)
          saved match {
            case Some(v) => spark.conf.set(MicrosKey, v)
            case None => spark.conf.unset(MicrosKey)
          }
        case (n, saved) => micros.update(spark, (n - 1, saved))
      }
    }
  }
}

class StorageException(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)
