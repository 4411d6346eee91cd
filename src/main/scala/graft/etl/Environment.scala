package graft.etl

import org.apache.spark.sql.SparkSession

/** A secret value whose `toString` is redacted — the engine analog of the
  * reference's token field (task.ts:75-77): the token must flow to the
  * `X-API-KEY` header and NOWHERE else, in particular not into logs,
  * plan strings, or `toString`ed config dumps.
  */
final class Secret(val value: String) extends Serializable {
  require(value != null && value.nonEmpty, "secret value must be non-empty")
  override def toString: String = "Secret(****)"
  override def equals(o: Any): Boolean = o match {
    case s: Secret => s.value == value
    case _ => false
  }
  override def hashCode: Int = value.hashCode
}

/** Typed runtime configuration — the engine analog of the reference's
  * TypeBox `Environment` (task.ts:74-82): one required secret
  * (`DroneSenseToken`) and one defaulted flag (`DEBUG`,
  * `Type.Boolean({default: false})`, task.ts:78-80). Resolution is
  * fail-loud like `this.env(Environment)` (task.ts:105): a missing
  * required key throws naming the key; a malformed boolean throws
  * instead of silently defaulting.
  *
  * The case-class `toString` inherits [[Secret]]'s redaction, so an
  * `Environment` can be logged safely.
  */
final case class Environment(droneSenseToken: Secret, debug: Boolean = false) {
  /** The auth header map the HTTP boundary consumes (task.ts:115). */
  def apiHeaders: Map[String, String] = Map("X-API-KEY" -> droneSenseToken.value)
}

object Environment {
  /** Spark-conf keys (the cluster-deploy channel). */
  val TokenConfKey = "spark.graft.dronesense.token"
  val DebugConfKey = "spark.graft.debug"
  /** OS-environment keys (the reference's own channel — Lambda env vars). */
  val TokenEnvKey = "DRONESENSE_TOKEN"
  val DebugEnvKey = "DEBUG"

  /** Resolve with precedence `overrides` > Spark conf > OS environment >
    * declared default. `DEBUG` has a default (false); the token does not —
    * missing it throws, naming every channel that was consulted.
    */
  def resolve(spark: SparkSession,
              overrides: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env): Environment = {
    def fromConf(key: String): Option[String] =
      spark.conf.getOption(key).filter(_.nonEmpty)
    def lookup(over: String, conf: String, osEnv: String): Option[String] =
      overrides.get(over).filter(_.nonEmpty)
        .orElse(fromConf(conf))
        .orElse(env.get(osEnv).filter(_.nonEmpty))
    val token = lookup("token", TokenConfKey, TokenEnvKey).getOrElse {
      throw new IllegalArgumentException(
        s"missing required config: DroneSense token (set $TokenConfKey spark " +
          s"conf, $TokenEnvKey env var, or pass overrides(\"token\"))")
    }
    val debug = lookup("debug", DebugConfKey, DebugEnvKey) match {
      case None => false // the declared default (task.ts:79)
      case Some(raw) => raw.trim.toLowerCase match {
        case "true" | "1" => true
        case "false" | "0" => false
        case other => throw new IllegalArgumentException(
          s"malformed boolean for DEBUG: '$other' (expected true/false/1/0)")
      }
    }
    Environment(new Secret(token), debug)
  }
}
