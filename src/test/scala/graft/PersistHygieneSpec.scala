package graft

import org.scalatest.matchers.should.Matchers

/** Cache-hygiene guard over the whole gate: a `persist()` leaked from a
  * query body holds executor block memory for the REST of a 149-query
  * driver session (round 9 shipped exactly this in q101). Every gate query
  * is fully evaluated (noop sink — no driver collect) and must leave zero
  * explicitly-persisted RDDs behind. `localCheckpoint` blocks are exempt:
  * they free on GC by design ([[graft.operators.Materialize]] documents the
  * trade-off), so only strong persist leaks — the kind GC can never fix
  * while the frame stays referenced — fail here. */
class PersistHygieneSpec extends SparkTestBase with Matchers {

  // private[spark] in the Scala source, public in bytecode
  private val locallyCheckpointed =
    classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
  private def isLocalCkpt(r: org.apache.spark.rdd.RDD[_]): Boolean =
    locallyCheckpointed.invoke(r).asInstanceOf[Boolean]

  it("no gate query leaves explicitly-persisted blocks after evaluation") {
    val sc = spark.sparkContext
    // the session is shared across suites — only blocks NEW since this
    // spec started can be attributed to the gate bodies
    val preexisting = sc.getPersistentRDDs.keySet
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf("sf0.001"))
      df.write.mode("overwrite").format("noop").save()
      val leaked = sc.getPersistentRDDs
        .filterNot { case (id, _) => preexisting(id) }
        .filterNot { case (_, r) => isLocalCkpt(r) }
      leaked.keys.toSeq.sorted.foreach(id => offenders += s"$name -> RDD $id")
      // release so one leak doesn't cascade into every later query's report
      leaked.values.foreach(_.unpersist(blocking = false))
    }
    offenders shouldBe empty
  }
}
