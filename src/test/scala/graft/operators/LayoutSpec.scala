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

  // signed: negative = left shift (narrow spans fill their high lanes)
  private def shiftOf(span: Long, bits: Int): Int =
    64 - java.lang.Long.numberOfLeadingZeros(span) - bits

  private def levelRef(x: Long, mn: Long, shift: Int): Long =
    if (shift >= 0) (x - mn) >> shift else (x - mn) << -shift

  describe("intLevel") {
    it("keeps every level below 2^bits and preserves order") {
      // span just over a power of two: the shift must round the top level down
      val mn = -37L; val mx = mn + (1L << 25) + 997L
      val bits = 12
      val xs = Seq(mn, mn + 1, mn + (mx - mn) / 3, mx - 1, mx)
      val lv = xs.toDF("x")
        .select(Layout.intLevel(col("x"), mn, mx, bits).as("l"))
        .as[Long].collect()
      assert(lv.forall(l => l >= 0 && l < (1L << bits)))
      assert(lv.toSeq == lv.toSeq.sorted)
      assert(lv.head == 0L)
    }

    it("is exact on epoch-nanosecond magnitudes where rangeBucket's double " +
        "path collapses neighbours") {
      val mn = 1704067200000000000L // > 2^53: doubles cannot represent ns steps
      val xs = (0 until 8).map(i => mn + (i.toLong << 38))
      val mx = xs.last
      val bits = 20
      val shift = shiftOf(mx - mn, bits)
      val got = xs.toDF("x")
        .select(Layout.intLevel(col("x"), mn, mx, bits).as("l"))
        .as[Long].collect()
      assert(got.toSeq == xs.map(x => (x - mn) >> shift))
      assert(got.distinct.length == xs.length) // neighbours stay distinct
    }
  }

  describe("zValue") {
    it("equals intLevel + mortonKey with observed stats") {
      val rnd = new scala.util.Random(7)
      val rows = Seq.fill(200)((rnd.nextLong().abs % (1L << 30),
        rnd.nextLong().abs % (1L << 44)))
      val df = rows.toDF("a", "b")
      val bits = 16
      val (amn, amx) = (rows.map(_._1).min, rows.map(_._1).max)
      val (bmn, bmx) = (rows.map(_._2).min, rows.map(_._2).max)
      val (sa, sb) = (shiftOf(amx - amn, bits), shiftOf(bmx - bmn, bits))
      val got = Layout.zValue(df, Seq("a", "b"), bits)
        .select("z_value").as[Long].collect().toSeq
      val want = rows.map { case (a, b) =>
        var z = 0L
        for (i <- 0 until bits) {
          z |= ((levelRef(a, amn, sa) >> i) & 1L) << (2 * i)
          z |= ((levelRef(b, bmn, sb) >> i) & 1L) << (2 * i + 1)
        }
        z
      }
      assert(got == want)
    }

    it("up-shifts a narrow dimension into its high lanes so it keeps " +
        "pruning power against a wide one") {
      // user-id-like narrow range vs epoch-like wide range: before the
      // signed shift, the narrow column's top interleave lanes were all
      // zero, the key degenerated to a sort on the wide column, and every
      // partition spanned the FULL narrow range (zero pruning)
      val rnd = new scala.util.Random(3)
      val rows = Seq.fill(4096)((rnd.nextInt(1500).toLong,
        1704067200000000000L + (rnd.nextLong().abs % (1L << 45))))
      val cl = Layout.clusterByZOrder(rows.toDF("u", "t"), Seq("u", "t"),
        bits = 18, numPartitions = 16)
      val keptForUSlice = cl.withColumn("p", spark_partition_id())
        .groupBy("p").agg(min("u").as("mn"), max("u").as("mx"))
        .where(col("mn") <= lit(760L) && col("mx") >= lit(700L))
        .count()
      info(s"partitions kept for the 4% narrow-column slice: $keptForUSlice/16")
      assert(keptForUSlice <= 12L,
        s"narrow-column slice kept $keptForUSlice/16 partitions — the " +
          "degenerate (un-normalised) key keeps all 16")
    }

    it("caller-provided ranges skip the stats pass and match observed stats") {
      val rows = Seq((0L, 0L), (511L, 1023L), (256L, 100L))
      val df = rows.toDF("a", "b")
      val observed = Layout.zValue(df, Seq("a", "b"), bits = 10)
        .select("z_value").as[Long].collect().toSeq
      val provided = Layout.zValue(df, Seq("a", "b"), bits = 10,
        ranges = Some(Seq((0L, 511L), (0L, 1023L))))
        .select("z_value").as[Long].collect().toSeq
      provided shouldBe observed
      // out-of-range values still get keys (degraded locality, not errors)
      Layout.zValue(df, Seq("a", "b"), bits = 10,
        ranges = Some(Seq((100L, 200L), (0L, 1023L))))
        .select("z_value").as[Long].collect().length shouldBe 3
      intercept[IllegalArgumentException] {
        Layout.zValue(df, Seq("a", "b"), bits = 10, ranges = Some(Seq((0L, 1L))))
      }
    }

    it("nulls in a clustering column yield a null key") {
      val df = Seq((1L, Some(5L), 10L), (2L, None, 20L), (3L, Some(9L), 30L))
        .toDF("id", "a", "b")
      val z = Layout.zValue(df, Seq("a", "b"), bits = 8)
      assert(z.where(col("id") === 2L).select("z_value").head().isNullAt(0))
      assert(z.where(col("id") =!= 2L).where(col("z_value").isNull).count() == 0)
    }

    it("fails loudly on empty input and on a key-column collision") {
      val df = Seq((1L, 2L)).toDF("a", "b")
      intercept[IllegalArgumentException] {
        Layout.zValue(df.where(col("a") < 0), Seq("a", "b"), 8).head()
      }
      intercept[IllegalArgumentException] {
        Layout.zValue(df.withColumn("z_value", lit(1)), Seq("a", "b"), 8)
      }
    }
  }

  describe("clusterByZOrder") {
    it("prunes partitions for a second-column filter where a single-column " +
        "range layout cannot") {
      // x and y independent-uniform: range-partitioning by x alone leaves
      // every partition spanning ALL of y, so a y-filter's min/max check
      // keeps all 16 partitions; z-order bounds both axes per partition
      val n = 4096
      val rnd = new scala.util.Random(11)
      val rows = Seq.fill(n)((rnd.nextInt(1 << 12).toLong,
        rnd.nextInt(1 << 12).toLong))
      val df = rows.toDF("x", "y")
      val parts = 16
      val (yLo, yHi) = (1000L, 1128L) // a 3% slice of the y range

      // partitions a footer-stats check would KEEP for the y-slice
      def kept(d: org.apache.spark.sql.DataFrame): Long =
        d.withColumn("p", spark_partition_id())
          .groupBy("p").agg(min("y").as("mn"), max("y").as("mx"))
          .where(col("mn") <= lit(yHi) && col("mx") >= lit(yLo))
          .count()

      val zClustered = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 12,
        numPartitions = parts)
      val xRanged = df.repartitionByRange(parts, col("x"))
      val (zKept, xKept) = (kept(zClustered), kept(xRanged))
      assert(xKept == parts.toLong)
      assert(zKept * 2 <= xKept,
        s"z-order kept $zKept/$parts partitions for the y-slice; " +
          s"expected at most half of the range layout's $xKept")
      assert(zClustered.columns.sameElements(df.columns)) // helper col dropped
    }

    it("sorts rows by the z-value within every partition") {
      val rows = (0 until 1000).map(i => ((i * 37) % 1000L, (i * 101) % 1000L))
      val df = rows.toDF("x", "y")
      val clustered = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 10,
        numPartitions = 4)
      // recompute the key on the clustered output (same data → same stats →
      // same shifts) and check per-partition monotonicity in row order
      val withZ = Layout.zValue(clustered, Seq("x", "y"), bits = 10)
        .withColumn("p", spark_partition_id())
      val violations = withZ
        .withColumn("prev", lag("z_value", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy("p")
            .orderBy(monotonically_increasing_id())))
        .where(col("prev") > col("z_value"))
        .count()
      assert(violations == 0L)
    }
  }
}
