package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

import graft.SparkTestBase

/** Crash-point recovery matrix (round-13 verdict item 7): a process KILLED
  * mid-append / mid-compact must leave state a FRESH open reads
  * consistently, with orphans reclaimed by the sweep. Each case arms one
  * named crash point on an ops subclass — throwing from the seam skips
  * every cleanup a surviving process would run, which is exactly what a
  * kill does — then reopens through the normal public path and asserts the
  * documented contract on [[AuditTable.compact]] / `writeParquet`. */
class CrashRecoverySpec extends SparkTestBase with Matchers {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private final class CrashInjected(point: String)
    extends RuntimeException(s"injected kill at $point")

  /** Ops whose named crash point simulates a kill -9. */
  private final class CrashOps(base: Path, armed: String)
    extends FileStorageOps(spark, Some(base)) {
    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    override protected[storage] def crashPoint(name: String): Unit = {
      hits += name
      if (name == armed) throw new CrashInjected(name)
    }
  }

  /** A two-append table (overlapping PK so dedup is load-bearing) plus the
    * snapshot contents every recovery must preserve. */
  private def seed(name: String): (AuditTable, Seq[(Long, String)]) = {
    val t0 = Storage.getOrCreateTable(spark, tmpDir,
      AuditTableInfo(name, Seq("id"), Map.empty, retainHistory = false))
    val t1 = t0.append(Seq((1L, "v1"), (2L, "v1")).toDF("id", "v"),
      None, ts("2024-01-01 10:00:00"))
    t1.append(Seq((1L, "v2"), (3L, "v2")).toDF("id", "v"),
      None, ts("2024-01-02 10:00:00")): Unit
    (Storage.openTable(spark, tmpDir, name).get,
      Seq((1L, "v2"), (2L, "v1"), (3L, "v2")))
  }

  /** The same handle rebuilt over crash-armed ops. */
  private def armed(t: AuditTable, point: String): (AuditTable, CrashOps) = {
    val ops = new CrashOps(new Path(tmpDir), point)
    (new AuditTable(t.info, t.regions, new Path(tmpDir), ops, spark,
      t.includeHot), ops)
  }

  private def snap(name: String): Seq[(Long, String)] =
    Storage.openTable(spark, tmpDir, name).get
      .snapshot(ts("2024-06-01 00:00:00")).get
      .select("id", "v").as[(Long, String)].collect().toSeq.sortBy(_._1)

  private def stagingLeaves: Seq[Path] = {
    val fs = new FileStorageOps(spark, Some(new Path(tmpDir))).fs
    val root = new Path(tmpDir, ".tmp")
    def walk(p: Path): Seq[Path] =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory).flatMap { st =>
        if (st.getPath.getName.matches(".*-[0-9a-f]{8}")) Seq(st.getPath)
        else walk(st.getPath)
      }
    walk(root)
  }

  describe("crash-point recovery (kill simulation via the ops seam)") {

    it("append killed between staging and publish: readers unaffected, orphan swept, retry clean") {
      val (t, expect) = seed("crash_append")
      val (crashy, ops) = armed(t, "publish.staged")
      intercept[CrashInjected] {
        crashy.append(Seq((9L, "v9")).toDF("id", "v"), None, ts("2024-02-01 10:00:00"))
      }
      ops.hits should contain("publish.staged")
      // the kill left the staged orphan (a surviving failure would not)
      stagingLeaves should not be empty
      // destination untouched: a fresh open reads exactly the pre-crash state
      snap("crash_append") shouldBe expect
      // an aged open sweeps the orphan (age 0 + brief wait = "older than")
      Thread.sleep(20)
      Storage.openTable(spark, tmpDir, "crash_append", stagingMaxAgeMs = 0L).get: Unit
      stagingLeaves shouldBe empty
      // and a retried append on a fresh handle lands normally
      val retried = Storage.openTable(spark, tmpDir, "crash_append").get
        .append(Seq((9L, "v9")).toDF("id", "v"), None, ts("2024-02-01 10:00:00"))
      retried.regions.size shouldBe t.regions.size + 1
      snap("crash_append") shouldBe (expect :+ (9L -> "v9"))
    }

    it("compact killed after publish, before trash: duplicates resolved, recompact completes") {
      val (t, expect) = seed("crash_pub")
      val (crashy, _) = armed(t, "compact.published")
      intercept[CrashInjected] { crashy.compact(ts("2024-03-01 10:00:00")) }
      // merge output live BESIDE its inputs: folder truth has hot + cold
      val half = Storage.openTable(spark, tmpDir, "crash_pub").get
      half.regions.map(_.storeType).toSet shouldBe Set("hot", "cold")
      // snapshot stays exact — PK dedup collapses the duplicate window
      snap("crash_pub") shouldBe expect
      // the next completed compaction re-merges and trashes the stragglers
      val done = half.compact(ts("2024-03-02 10:00:00"))
      done.regions.map(_.storeType).distinct shouldBe Seq("cold")
      snap("crash_pub") shouldBe expect
    }

    it("compact killed mid-trash: half-trashed layout reads consistently and recompacts") {
      val (t, expect) = seed("crash_trash")
      val (crashy, ops) = armed(t, "trash.moved")
      intercept[CrashInjected] { crashy.compact(ts("2024-03-01 10:00:00")) }
      ops.hits.count(_ == "trash.moved") shouldBe 1 // killed after the FIRST move
      // stale .regioninfo no longer matches the folders -> rebuilt on open
      snap("crash_trash") shouldBe expect
      val done = Storage.openTable(spark, tmpDir, "crash_trash").get
        .compact(ts("2024-03-02 10:00:00"))
      done.regions.map(_.storeType).distinct shouldBe Seq("cold")
      snap("crash_trash") shouldBe expect
    }

    it("compact killed after trash, before the cache rewrite: stale cache detected and rebuilt") {
      val (t, expect) = seed("crash_cache")
      val (crashy, _) = armed(t, "compact.cached")
      intercept[CrashInjected] { crashy.compact(ts("2024-03-01 10:00:00")) }
      // the compaction itself fully happened; only the advisory cache lies
      val fresh = Storage.openTable(spark, tmpDir, "crash_cache").get
      fresh.regions.map(_.storeType).distinct shouldBe Seq("cold")
      snap("crash_cache") shouldBe expect
    }

    it("a completed compact sweeps staging orphans left by earlier kills") {
      val (t, expect) = seed("crash_janitor")
      val (crashy, _) = armed(t, "publish.staged")
      intercept[CrashInjected] {
        crashy.append(Seq((9L, "v9")).toDF("id", "v"), None, ts("2024-02-01 10:00:00"))
      }
      stagingLeaves should not be empty
      Thread.sleep(20)
      // trashMaxAgeMs = 0 doubles as the staging sweep age inside compact
      Storage.openTable(spark, tmpDir, "crash_janitor").get
        .compact(ts("2024-03-01 10:00:00"), trashMaxAgeMs = 0L): Unit
      stagingLeaves shouldBe empty
      snap("crash_janitor") shouldBe expect
    }
  }
}
