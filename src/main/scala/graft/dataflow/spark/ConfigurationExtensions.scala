package graft.dataflow.spark

import java.util.ServiceLoader
import scala.jdk.CollectionConverters._

import graft.dataflow.FlowException

/** Conf-driven flow extensions, discovered via `ServiceLoader` and enabled
  * with `spark.graft.dataflow.extensions=<name>[,<name>…]` — the session
  * conf alone can turn on caching or other flow rewrites without code
  * changes. Reference: DataFlow.scala:345-367, 659-670 and
  * spark/CacheConfigurationExtension.scala:6-29.
  *
  * Implementations register in
  * `META-INF/services/graft.dataflow.spark.FlowConfigurationExtension`.
  */
trait FlowConfigurationExtension {
  /** Name used in the conf list. */
  def extensionKey: String
  def preRegistration(flow: SparkDataFlow): SparkDataFlow
}

object FlowConfigurationExtension {

  val ConfKey = "spark.graft.dataflow.extensions"

  def loadAll(): Seq[FlowConfigurationExtension] =
    ServiceLoader.load(classOf[FlowConfigurationExtension]).asScala.toSeq

  /** Apply the extensions the session conf enables (no-op when unset). */
  def applyEnabled(flow: SparkDataFlow): SparkDataFlow =
    flow.spark.conf.getOption(ConfKey).filter(_.nonEmpty).fold(flow) { enabled =>
      val available = loadAll().map(e => e.extensionKey -> e).toMap
      enabled.split(",").map(_.trim).filter(_.nonEmpty).foldLeft(flow) { (fl, key) =>
        available.getOrElse(key,
          throw new FlowException(
            s"Unknown flow configuration extension [$key]; available: " +
              available.keys.toSeq.sorted.mkString(", "))).preRegistration(fl)
      }
    }
}

/** `spark.graft.dataflow.extensions=cacheasparquet` +
  * `spark.graft.spark.cacheAsParquet.labels=a,b` — plan parquet caching for
  * the listed labels (normal reuse-elision applies). */
class CacheAsParquetConfigurationExtension extends FlowConfigurationExtension {
  import caching._
  val extensionKey = "cacheasparquet"
  def preRegistration(flow: SparkDataFlow): SparkDataFlow =
    flow.spark.conf.getOption("spark.graft.spark.cacheAsParquet.labels")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .fold(flow)(labels => flow.cacheAsParquetPlanned(labels: _*))
}

/** `spark.graft.dataflow.extensions=sparkcache` +
  * `spark.graft.spark.cache.labels=a,b` — plan Spark persist caching. */
class SparkCacheConfigurationExtension extends FlowConfigurationExtension {
  import caching._
  val extensionKey = "sparkcache"
  def preRegistration(flow: SparkDataFlow): SparkDataFlow =
    flow.spark.conf.getOption("spark.graft.spark.cache.labels")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .fold(flow)(labels => labels.foldLeft(flow)((fl, l) => fl.sparkCachePlanned(l)))
}
