package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named SparkEntry queries repeatedly.
  * Usage: runMain graft.tools.Profile <sfDir> <query...> */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    names.foreach { n => graft.SparkEntry.queries(n)(spark, sfDir).count() }
    (1 to 2).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val c = graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[$i] $n%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$c")
      }
    }
    if (sys.env.contains("PROFILE_EXPLAIN"))
      names.foreach { n =>
        println(s"==== $n ====")
        graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
