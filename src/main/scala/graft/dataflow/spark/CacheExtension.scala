package graft.dataflow.spark

import org.apache.spark.storage.StorageLevel

import graft.dataflow._

/** Cache planning: caching requests are recorded as metadata and applied at
  * prepare time, skipping labels consumed by fewer than two actions (caching
  * something read once is pure overhead). Opt out of elision with
  * `spark.graft.dataflow.cacheOnlyReusedLabels=false`.
  * Reference: CacheMetadataExtension.scala:13-82.
  */
sealed trait CacheRequest
object CacheRequest {
  final case class AsParquet(partitions: Option[Either[Seq[String], Int]]) extends CacheRequest
  final case class Persist(level: StorageLevel) extends CacheRequest
}

final case class CachePlanExtension(requests: Map[String, CacheRequest] = Map.empty)
  extends FlowExtension[SparkDataFlow, SparkFlowContext] {

  val identifier: String = "cachePlan"

  // decides elision from consumer counts — must see commit-staged actions
  override def ordering: Int = 90

  override def merge(
      other: FlowExtension[SparkDataFlow, SparkFlowContext]): CachePlanExtension = {
    val that = other.asInstanceOf[CachePlanExtension]
    val conflicts = requests.keySet.intersect(that.requests.keySet)
      .filter(l => requests(l) != that.requests(l))
    if (conflicts.nonEmpty)
      throw new FlowException("Cannot merge flows: conflicting cache requests for: " +
        conflicts.toSeq.sorted.mkString(", "))
    CachePlanExtension(requests ++ that.requests)
  }

  def preExecutionManipulation(flow: SparkDataFlow): SparkDataFlow = {
    import actions._
    val onlyReused = flow.spark.conf
      .getOption("spark.graft.dataflow.cacheOnlyReusedLabels").forall(_.toBoolean)
    val consumers: Map[String, Int] = flow.actions
      .flatMap(_.inputLabels).groupBy(identity).view.mapValues(_.size).toMap
    requests.foldLeft(flow) { case (fl, (label, request)) =>
      if (onlyReused && consumers.getOrElse(label, 0) < 2) fl
      else request match {
        case CacheRequest.AsParquet(_) => fl.cacheAsParquet(label)
        case CacheRequest.Persist(level) => fl.sparkCache(label, level)
      }
    }
  }
}

object caching {

  implicit class CachePlanOps(val flow: SparkDataFlow) extends AnyVal {

    private def extension: CachePlanExtension =
      flow.extensions.get("cachePlan").map(_.asInstanceOf[CachePlanExtension])
        .getOrElse(CachePlanExtension())

    /** Request parquet-checkpoint caching for labels; applied at prepare time
      * only when the label is actually reused. */
    def cacheAsParquetPlanned(labels: String*): SparkDataFlow =
      flow.addExtension(extension.copy(requests = extension.requests ++
        labels.map(_ -> CacheRequest.AsParquet(None))))

    /** Request Spark persist caching, same elision rules. */
    def sparkCachePlanned(label: String,
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): SparkDataFlow =
      flow.addExtension(extension.copy(requests = extension.requests +
        (label -> CacheRequest.Persist(level))))
  }
}
