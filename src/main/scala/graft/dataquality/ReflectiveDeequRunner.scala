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
/** SINGLE SOURCE OF TRUTH for every class name, method name and arity the
  * reflective binding requires of the vendor jar. [[ReflectiveDeequRunner]]
  * binds through these constants only, and [[missing]] mechanically probes
  * each one — so a Deequ upgrade that renames/re-arities anything fails
  * [[ReflectiveDeequRunner.apply]] (and the canary spec) with a readable
  * list of every drifted member, not a NoSuchMethodException mid-flow. */
object DeequApiSurface {
  val verificationSuiteClass = "com.amazon.deequ.VerificationSuite"
  val resultKeyClass = "com.amazon.deequ.repository.ResultKey"
  /** ResultKey(dataSetDate: Long, tags: Map[String, String]) — the full
    * case-class constructor signature in every Deequ release. */
  val resultKeyArity = 2
  val onData = "onData"
  val useRepository = "useRepository"
  val saveOrAppendResult = "saveOrAppendResult"
  val run = "run"
  val status = "status"
  val checkResults = "checkResults"
  val constraintResults = "constraintResults"
  val constraint = "constraint"
  val message = "message"
  /** Where CheckResult/ConstraintResult live: the released Deequ keeps them
    * in `.checks`/`.constraints` subpackages; at least one candidate per
    * type must resolve (map values are type-erased, so these cannot be
    * walked from return types like the builder chain can). */
  val checkResultCandidates = Seq(
    "com.amazon.deequ.checks.CheckResult", "com.amazon.deequ.CheckResult")
  val constraintResultCandidates = Seq(
    "com.amazon.deequ.constraints.ConstraintResult",
    "com.amazon.deequ.ConstraintResult")

  /** Every unsatisfied requirement on `loader`, as readable one-liners
    * (empty = the full binding surface resolves). The builder chain is
    * walked through DECLARED RETURN TYPES (onData -> builder -> run ->
    * result), so package moves there are followed, not guessed. */
  def missing(loader: ClassLoader): Seq[String] = {
    import scala.util.Try
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def klass(n: String): Option[Class[_]] =
      Try(Class.forName(n, false, loader)).toOption
    def needMethod(c: Class[_], m: String, arity: Int): Option[java.lang.reflect.Method] = {
      val found = c.getMethods.find(x => x.getName == m && x.getParameterCount == arity)
      if (found.isEmpty) out += s"${c.getName}.$m/$arity: no such method"
      found
    }
    klass(verificationSuiteClass) match {
      case None => out += s"$verificationSuiteClass: class not found"
      case Some(suite) =>
        if (!suite.getConstructors.exists(_.getParameterCount == 0))
          out += s"$verificationSuiteClass: no 0-arg constructor"
        needMethod(suite, onData, 1).foreach { od =>
          val builder = od.getReturnType
          needMethod(builder, run, 0).foreach { r =>
            val result = r.getReturnType
            needMethod(result, status, 0)
            needMethod(result, checkResults, 0)
          }
          needMethod(builder, useRepository, 1).foreach { ur =>
            needMethod(ur.getReturnType, saveOrAppendResult, 1)
          }
        }
    }
    klass(resultKeyClass) match {
      case None => out += s"$resultKeyClass: class not found"
      case Some(rk) =>
        if (!rk.getConstructors.exists(_.getParameterCount == resultKeyArity))
          out += s"$resultKeyClass: no $resultKeyArity-arg constructor"
    }
    def anyCandidate(cands: Seq[String], methods: Seq[String]): Unit = {
      val ok = cands.flatMap(klass).exists(c =>
        methods.forall(m => c.getMethods.exists(x =>
          x.getName == m && x.getParameterCount == 0)))
      if (!ok) out += s"none of ${cands.mkString(" | ")} has ${methods.mkString("/")}"
    }
    anyCandidate(checkResultCandidates, Seq(status, constraintResults))
    anyCandidate(constraintResultCandidates, Seq(constraint, status, message))
    out.toSeq
  }
}

final class ReflectiveDeequRunner private[deequ] (loader: ClassLoader)
    extends DeequVerificationRunner[AnyRef, AnyRef, AnyRef] {

  import DeequApiSurface._

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
    val suite = cls(verificationSuiteClass)
      .getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    call(suite, DeequApiSurface.onData, data)
  }

  override def useRepository(builder: AnyRef, repository: AnyRef,
      resultKeyMillis: Long): AnyRef = {
    val withRepo = call(builder, DeequApiSurface.useRepository, repository)
    val keyCls = cls(resultKeyClass)
    val ctor = keyCls.getConstructors.find(_.getParameterCount == resultKeyArity)
      .getOrElse(throw new NoSuchMethodException(
        s"$resultKeyClass(Long, Map) — Deequ API mismatch"))
    val key = ctor.newInstance(java.lang.Long.valueOf(resultKeyMillis),
      Map.empty[String, String]).asInstanceOf[AnyRef]
    call(withRepo, saveOrAppendResult, key)
  }

  override def run(builder: Either[AnyRef, AnyRef]): DeequVerificationOutcome = {
    val result = call(builder.merge, DeequApiSurface.run)
    val crs = call(result, checkResults)
      .asInstanceOf[scala.collection.Map[AnyRef, AnyRef]]
    val checks = crs.values.toSeq.map { cr =>
      val constraints = call(cr, constraintResults).asInstanceOf[Seq[AnyRef]]
        .map { c =>
          DeequConstraintResult(
            String.valueOf(call(c, constraint)),
            constraintStatusOf(call(c, status)),
            call(c, message).asInstanceOf[Option[String]])
        }
      DeequCheckResult(statusOf(call(cr, status)), constraints)
    }
    DeequVerificationOutcome(statusOf(call(result, status)), checks)
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

  /** Fails fast with a friendly message when the vendor jar is missing, and
    * with the FULL readable drift list when it is present but its API no
    * longer matches [[DeequApiSurface]] (version-drift canary: one wrong
    * member fails here, at construction, naming every mismatch — never as
    * a NoSuchMethodException inside a running flow). */
  def apply(loader: ClassLoader = defaultLoader): ReflectiveDeequRunner = {
    if (!isAvailable(loader))
      throw new DataQualityException(
        "Deequ (com.amazon.deequ) is not on the classpath. Add the deequ jar " +
          "matching your Spark/Scala version to use ReflectiveDeequRunner; " +
          "offline, supply your own DeequVerificationRunner instead.")
    val drift = DeequApiSurface.missing(loader)
    if (drift.nonEmpty)
      throw new DataQualityException(
        "Deequ is on the classpath but its API does not match the surface " +
          s"this binding requires (version drift?):\n  ${drift.mkString("\n  ")}")
    new ReflectiveDeequRunner(loader)
  }

  private def defaultLoader: ClassLoader =
    Option(Thread.currentThread.getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
}
