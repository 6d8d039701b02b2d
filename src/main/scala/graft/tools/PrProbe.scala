package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the PageRank gate queries (local tuning
  * only; not part of the driver contract). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    // warmup
    t("lineitem").limit(100).collect()
    spark.range(100000).groupBy((col("id") % 97).as("k")).count().count()

    val e0 = t("orders")
      .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
    time("edge join count only")(e0.count())
    time("full pageRank 3 iters") {
      graft.operators.Graphs.pageRank(e0, "src", "dst", iterations = 3).count()
    }
    time("full pageRank again") {
      graft.operators.Graphs.pageRank(e0, "src", "dst", iterations = 3).count()
    }
    spark.stop()
  }
}
