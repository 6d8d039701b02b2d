package com.amazon.deequ.repository

import com.amazon.deequ.VerificationResult

import scala.collection.mutable

/** TEST-ONLY mirrors of Deequ's repository types (exact names/signatures
  * the reflective runner constructs and passes through). */
final case class ResultKey(dataSetDate: Long,
    tags: Map[String, String] = Map.empty)

trait MetricsRepository {
  def save(key: ResultKey, result: VerificationResult): Unit
}

/** Records every save so specs can assert the useRepository →
  * saveOrAppendResult → run path executed with the metadata's timestamp. */
class InMemoryMetricsRepository extends MetricsRepository {
  val saved: mutable.Buffer[(ResultKey, VerificationResult)] = mutable.Buffer.empty
  override def save(key: ResultKey, result: VerificationResult): Unit =
    saved += (key -> result)
}
