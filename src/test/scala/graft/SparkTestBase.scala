package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funspec.AnyFunSpec

import java.nio.file.Files

/** Shared local SparkSession + per-suite temp dir, in the spirit of the
  * reference's SparkSpec (fresh session per suite instead of per test — the
  * suites here don't mutate session state). */
trait SparkTestBase extends AnyFunSpec with BeforeAndAfterAll {

  protected lazy val spark: SparkSession = SparkTestBase.session

  protected var tmpDir: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    tmpDir = Files.createTempDirectory("graft-test").toString
  }

  protected def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkTestBase {
  // one session for the whole JVM test run (forked once by sbt)
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // TextFunctions' pure-Column helpers reach native graft expressions
    graft.sql.functions.ensureRegistered(s)
    s
  }
}
