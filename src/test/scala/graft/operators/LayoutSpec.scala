package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("mortonKey") {

    it("interleaves bits as documented (bit b of col i at b*n+i)") {
      // x=0b11, y=0b01 with 2 bits -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3
      //                                 =  1   |  1<<1 |  1<<2 |  0    = 0b0111
      val df = Seq((3L, 1L)).toDF("x", "y")
      df.select(Layout.mortonKey(Seq(col("x"), col("y")), 2).as("z"))
        .as[Long].head() shouldBe 7L

      // full 8-bit roundtrip against a reference implementation
      val ref = (x: Long, y: Long) => (0 until 8).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.reduce(_ | _)
      val rows = Seq((0L, 0L), (255L, 255L), (170L, 85L), (1L, 128L), (37L, 201L))
      rows.toDF("x", "y")
        .select(col("x"), col("y"), Layout.mortonKey(Seq(col("x"), col("y")), 8).as("z"))
        .as[(Long, Long, Long)].collect().foreach { case (x, y, z) =>
          z shouldBe ref(x, y)
        }
    }

    it("mortonKeySql computes the identical key via Spark SQL") {
      val df = spark.range(1000).select(
        (col("id") % 256).as("x"), ((col("id") * 37) % 256).as("y"))
      df.createOrReplaceTempView("morton_in")
      val viaSql = spark.sql(
        s"SELECT ${Layout.mortonKeySql(Seq("x", "y"), 8)} AS z FROM morton_in ORDER BY x, y")
        .as[Long].collect()
      val viaCol = df
        .select(col("x"), col("y"), Layout.mortonKey(Seq(col("x"), col("y")), 8).as("z"))
        .orderBy(col("x"), col("y")).select("z").as[Long].collect()
      viaSql shouldBe viaCol
    }

    it("rejects invalid shapes") {
      an[IllegalArgumentException] should be thrownBy
        Layout.mortonKey(Seq(col("x")), 8)
      an[IllegalArgumentException] should be thrownBy
        Layout.mortonKey(Seq(col("x"), col("y")), 32)
      an[IllegalArgumentException] should be thrownBy
        Layout.rangeBucket(col("x"), 5.0, 5.0, 8)
    }
  }

  describe("rangeBucket") {
    it("clamps outliers into the edge buckets") {
      val df = Seq(-10.0, 0.0, 255.9, 511.9, 512.0, 9999.0).toDF("v")
      df.select(Layout.rangeBucket(col("v"), 0.0, 512.0, 8).as("b"))
        .as[Long].collect() shouldBe Array(0L, 0L, 127L, 255L, 255L, 255L)
    }
  }

  describe("writeZOrdered") {

    it("lets point filters on the secondary dimension skip most files") {
      // 64x64 grid, 8 files. A single-dimension x-sort gives perfect
      // pruning on x but every file spans the FULL y range — a y filter
      // must read all 8 files. Z-order bounds the per-file extent of BOTH
      // dims, so either filter skips most files.
      val n = 1 << 12
      val df = spark.range(n).select(
        (col("id") % 64).as("x"), ((col("id") / 64) % 64).as("y"))

      // files whose [min,max] stats contain the probe — what a parquet
      // reader would have to scan for `dim = v`
      def filesMatching(path: String, dim: String, v: Long): Long =
        spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg(min(dim).as("lo"), max(dim).as("hi"))
          .where(col("lo") <= v && col("hi") >= v)
          .count()

      val xSorted = s"$tmpDir/x_sorted"
      df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
        .write.parquet(xSorted)
      val zed = s"$tmpDir/zordered"
      Layout.writeZOrdered(df, zed, Seq(col("x"), col("y")), bits = 6, numFiles = 8)

      filesMatching(xSorted, "y", 17L) shouldBe 8L // y filter: no pruning at all
      val zy = filesMatching(zed, "y", 17L)
      val zx = filesMatching(zed, "x", 17L)
      zy should be <= 5L // y filter now skips files...
      zx should be <= 5L // ...and x pruning survives the interleave
      // and nothing was lost or duplicated
      spark.read.parquet(zed).count() shouldBe n.toLong
      spark.read.parquet(zed).columns.toSet shouldBe Set("x", "y")
    }
  }
}
