package graft.dataquality.deequ

import org.apache.spark.sql.DataFrame

import scala.util.Try

import graft.dataquality.DataQualityException

/** Drop-in binding of [[DeequVerificationRunner]] to the real Deequ API
  * (com.amazon.deequ, Apache-2.0 — the library the reference's
  * waimak-deequ/.../DeequCheck.scala:23-94 builds on), resolved reflectively
  * at runtime so this module compiles — and everything else keeps working —
  * when the vendor jar is absent (this build environment has no egress).
  *
  * A user who drops the Deequ jar on the classpath gets the reference
  * behaviour with zero glue:
  * {{{
  * implicit val runner: DeequVerificationRunner[AnyRef, AnyRef, AnyRef] =
  *   ReflectiveDeequRunner()
  * flow.addDataQualityCheck("label", DeequCheck(
  *   checks = b => /* VerificationRunBuilder transforms, cast as needed */ b))
  * }}}
  *
  * Binding surface (all public, stable Deequ API):
  *  - `VerificationSuite().onData(df)` → `VerificationRunBuilder`
  *  - `builder.useRepository(repo).saveOrAppendResult(ResultKey(millis, Map()))`
  *  - `builder.run()` → `VerificationResult(status, checkResults)` whose
  *    per-check `CheckResult.constraintResults` carry
  *    `(constraint, status, message)`.
  * Status mapping: `CheckStatus.{Success,Warning,Error}` map by name;
  * `ConstraintStatus.Failure` maps to [[DeequStatus.Error]] (it only gates
  * the != Success alert filter, the alert's importance comes from the
  * check-level status — reference DeequCheck.getAlerts).
  */
final class ReflectiveDeequRunner private[deequ] (loader: ClassLoader)
    extends DeequVerificationRunner[AnyRef, AnyRef, AnyRef] {

  private def cls(name: String): Class[_] = Class.forName(name, true, loader)

  /** Invoke by name + arity with virtual dispatch; Deequ's builders have no
    * same-name same-arity overloads on the paths we touch. */
  private def call(target: AnyRef, name: String, args: AnyRef*): AnyRef = {
    val m = target.getClass.getMethods
      .find(m => m.getName == name && m.getParameterCount == args.length)
      .getOrElse(throw new NoSuchMethodException(
        s"${target.getClass.getName}.$name/${args.length} — Deequ API mismatch"))
    m.invoke(target, args: _*)
  }

  override def onData(data: DataFrame): AnyRef = {
    val suite = cls("com.amazon.deequ.VerificationSuite")
      .getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    call(suite, "onData", data)
  }

  override def useRepository(builder: AnyRef, repository: AnyRef,
      resultKeyMillis: Long): AnyRef = {
    val withRepo = call(builder, "useRepository", repository)
    // ResultKey(dataSetDate: Long, tags: Map[String, String]) — the 2-arg
    // constructor is the full case-class signature in every Deequ release
    val keyCls = cls("com.amazon.deequ.repository.ResultKey")
    val ctor = keyCls.getConstructors.find(_.getParameterCount == 2)
      .getOrElse(throw new NoSuchMethodException(
        "com.amazon.deequ.repository.ResultKey(Long, Map) — Deequ API mismatch"))
    val key = ctor.newInstance(java.lang.Long.valueOf(resultKeyMillis),
      Map.empty[String, String]).asInstanceOf[AnyRef]
    call(withRepo, "saveOrAppendResult", key)
  }

  override def run(builder: Either[AnyRef, AnyRef]): DeequVerificationOutcome = {
    val result = call(builder.merge, "run")
    val checkResults = call(result, "checkResults")
      .asInstanceOf[scala.collection.Map[AnyRef, AnyRef]]
    val checks = checkResults.values.toSeq.map { cr =>
      val constraints = call(cr, "constraintResults").asInstanceOf[Seq[AnyRef]]
        .map { c =>
          DeequConstraintResult(
            String.valueOf(call(c, "constraint")),
            constraintStatusOf(call(c, "status")),
            call(c, "message").asInstanceOf[Option[String]])
        }
      DeequCheckResult(statusOf(call(cr, "status")), constraints)
    }
    DeequVerificationOutcome(statusOf(call(result, "status")), checks)
  }

  private def statusOf(v: AnyRef): DeequStatus = String.valueOf(v) match {
    case "Success" => DeequStatus.Success
    case "Warning" => DeequStatus.Warning
    case _ => DeequStatus.Error
  }

  /** ConstraintStatus has only Success/Failure; Failure → Error (the value
    * only feeds the != Success filter in getAlerts). */
  private def constraintStatusOf(v: AnyRef): DeequStatus =
    String.valueOf(v) match {
      case "Success" => DeequStatus.Success
      case _ => DeequStatus.Error
    }
}

object ReflectiveDeequRunner {

  /** Classpath probe — true iff the Deequ jar is resolvable. */
  def isAvailable(loader: ClassLoader = defaultLoader): Boolean =
    Try(Class.forName("com.amazon.deequ.VerificationSuite", false, loader)).isSuccess

  /** Fails fast with a friendly message when the vendor jar is missing. */
  def apply(loader: ClassLoader = defaultLoader): ReflectiveDeequRunner = {
    if (!isAvailable(loader))
      throw new DataQualityException(
        "Deequ (com.amazon.deequ) is not on the classpath. Add the deequ jar " +
          "matching your Spark/Scala version to use ReflectiveDeequRunner; " +
          "offline, supply your own DeequVerificationRunner instead.")
    new ReflectiveDeequRunner(loader)
  }

  private def defaultLoader: ClassLoader =
    Option(Thread.currentThread.getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
}
