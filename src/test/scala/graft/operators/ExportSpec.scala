package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class ExportSpec extends SparkTestBase with Matchers {

  import spark.implicits._

  describe("Export shard assignment / manifest / write") {

    it("assigns every doc a shard in range; assignment is partitioning-independent") {
      val docs = (1L to 1000L).toDF("id")
      val a = Export.shardAssignment(docs, col("id"), docsPerShard = 100L)
      a.where(col("shard") < 0 || col("shard") >= 10).count() shouldBe 0
      val byId = a.orderBy("id").as[(Long, Long)].collect().toSeq
      val byId2 = Export.shardAssignment(docs.repartition(7), col("id"), 100L)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      byId2 shouldBe byId
      // balance: hash buckets deviate by ~sqrt, not systematically
      val sizes = a.groupBy("shard").count().as[(Long, Long)].collect().map(_._2)
      sizes.sum shouldBe 1000L
      all(sizes.toSeq) should be > 50L
      all(sizes.toSeq) should be < 200L
    }

    it("manifest xor fingerprint detects a changed shard") {
      val docs = (1L to 400L).toDF("id")
      val m1 = Export.shardManifest(
        Export.shardAssignment(docs, col("id"), 100L), col("id"))
        .orderBy("shard").collect()
      // swap one doc for another: exactly the affected shards' xor changes
      val docs2 = ((1L to 399L) :+ 9999L).toDF("id")
      val m2 = Export.shardManifest(
        Export.shardAssignment(docs2, col("id"), 100L), col("id"))
        .orderBy("shard").collect()
      m1.length shouldBe m2.length
      val changed = m1.zip(m2).count { case (a, b) =>
        a.getAs[Long]("content_xor") != b.getAs[Long]("content_xor") }
      changed should be >= 1
      changed should be <= 2 // doc 400's shard and/or doc 9999's shard
    }

    it("writeShards produces one folder per shard whose counts match the manifest") {
      val docs = (1L to 300L).map(i => (i, s"doc $i")).toDF("id", "text")
      val out = s"$tmpDir/shards"
      val manifest = Export.writeShards(docs, col("id"), out, docsPerShard = 100L)
        .orderBy("shard").as[(Long, Long, Long, Long, Long)].collect()
      manifest.map(_._2).sum shouldBe 300L
      manifest.foreach { case (shard, nDocs, _, _, _) =>
        val back = spark.read.parquet(s"$out/shard=$shard")
        back.count() shouldBe nDocs
      }
      // re-export is byte-identical in assignment: same manifest
      val again = Export.writeShards(docs, col("id"), out, docsPerShard = 100L)
        .orderBy("shard").as[(Long, Long, Long, Long, Long)].collect()
      again.toSeq shouldBe manifest.toSeq
    }
  }
}
