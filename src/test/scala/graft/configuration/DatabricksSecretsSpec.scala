package graft.configuration

import org.scalatest.BeforeAndAfterEach
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

private[configuration] case class DbConf(user: String, password: String, port: Int = 5432)

/** The Databricks secret-scope property provider over an injected fake
  * client (the vendor binding is reflective and absent off-cluster — same
  * test strategy as the reference, which fakes com.databricks.dbutils_v1
  * in its own test sources). */
class DatabricksSecretsSpec extends SparkTestBase with Matchers with BeforeAndAfterEach {

  private val B = DatabricksSecretsPropertyProviderBuilder

  /** get throws on a miss, like the vendor API. */
  private class FakeClient(scopes: Map[String, Map[String, String]])
    extends SecretScopeClient {
    var listCalls = 0
    override def listScopes(): Seq[String] = { listCalls += 1; scopes.keys.toSeq.sorted }
    override def get(scope: String, key: String): String =
      scopes.getOrElse(scope, throw new NoSuchElementException(scope))
        .getOrElse(key, throw new NoSuchElementException(key))
  }

  override def afterEach(): Unit = {
    B.clientOverride = None
    spark.conf.unset(B.ScopesKey)
    spark.conf.unset(B.ReplaceSpecialCharactersKey)
    spark.conf.unset(ConfigParser.BuilderModulesKey)
    super.afterEach()
  }

  it("searches every listed scope in order; first hit wins") {
    val fake = new FakeClient(Map(
      "alpha" -> Map("k1" -> "a1"),
      "beta" -> Map("k1" -> "b1", "k2" -> "b2")))
    B.clientOverride = Some(fake)
    val p = B.getPropertyProvider(spark)
    p.get("k1") shouldBe Some("a1") // alpha precedes beta in sorted order
    p.get("k2") shouldBe Some("b2") // miss in alpha falls through to beta
    p.get("k3") shouldBe None // miss everywhere
    fake.listCalls should be >= 3 // scope list re-evaluated per lookup
  }

  it("restricts the search to the configured scope list") {
    B.clientOverride = Some(new FakeClient(Map(
      "alpha" -> Map("k1" -> "a1"),
      "beta" -> Map("k1" -> "b1"))))
    spark.conf.set(B.ScopesKey, "beta")
    B.getPropertyProvider(spark).get("k1") shouldBe Some("b1")
  }

  it("sanitises special key characters by default, raw when disabled") {
    val fake = new FakeClient(Map("s" -> Map(
      "spark-graft-db-password-" -> "sane", "spark.graft.db.password!" -> "raw")))
    B.clientOverride = Some(fake)
    B.getPropertyProvider(spark).get("spark.graft.db.password!") shouldBe Some("sane")
    spark.conf.set(B.ReplaceSpecialCharactersKey, "false")
    B.getPropertyProvider(spark).get("spark.graft.db.password!") shouldBe Some("raw")
  }

  it("fails with a clear message off-cluster when no client is injected") {
    B.clientOverride = None
    val e = intercept[ConfigException] {
      B.getPropertyProvider(spark).get("anything")
    }
    e.getMessage should include("com.databricks.dbutils_v1")
  }

  it("wires in declaratively through propertyProviderBuilderModules") {
    B.clientOverride = Some(new FakeClient(Map(
      "prod" -> Map("graft-db-user" -> "svc", "graft-db-password" -> "hunter2"))))
    spark.conf.set(ConfigParser.BuilderModulesKey,
      "graft.configuration.DatabricksSecretsPropertyProviderBuilder")
    // secrets resolve through the provider; the declared default still wins
    // for keys the provider misses (port)
    val c = ConfigParser[DbConf](spark, "graft.db.")
    c shouldBe DbConf("svc", "hunter2", 5432)
  }

  it("rejects an unknown builder module with a clear error") {
    spark.conf.set(ConfigParser.BuilderModulesKey, "graft.configuration.Nope")
    val e = intercept[ConfigException] { ConfigParser[DbConf](spark, "graft.db.") }
    e.getMessage should include("graft.configuration.Nope")
  }
}
