package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer
import graft.etl.{DroneSense, Environment}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Typed runtime config (reference Environment, task.ts:74-82, 105):
  * defaulting, fail-loud resolution, secret redaction, and the
  * DEBUG-gated verbose decode (task.ts:120).
  */
class EnvironmentSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val token = "tok-abc123-SECRET"

  test("DEBUG default applies when no channel sets it (TypeBox default:false)") {
    val env = Environment.resolve(spark, overrides = Map("token" -> token),
      env = Map.empty)
    assert(!env.debug)
    assert(env.droneSenseToken.value == token)
  }

  test("missing token fails loudly, naming every channel") {
    spark.conf.unset(Environment.TokenConfKey)
    val e = intercept[IllegalArgumentException] {
      Environment.resolve(spark, env = Map.empty)
    }
    assert(e.getMessage.contains(Environment.TokenConfKey))
    assert(e.getMessage.contains(Environment.TokenEnvKey))
  }

  test("toString redacts the secret everywhere") {
    val env = Environment.resolve(spark, overrides = Map("token" -> token),
      env = Map.empty)
    assert(!env.toString.contains(token))
    assert(!env.droneSenseToken.toString.contains(token))
    assert(env.toString.contains("Secret(****)"))
    // but the value is still reachable where it is needed — the header map
    assert(env.apiHeaders == Map("X-API-KEY" -> token))
  }

  test("resolution precedence: overrides > spark conf > OS env") {
    spark.conf.set(Environment.TokenConfKey, "conf-token")
    spark.conf.set(Environment.DebugConfKey, "true")
    try {
      val fromConf = Environment.resolve(spark,
        env = Map(Environment.TokenEnvKey -> "env-token",
          Environment.DebugEnvKey -> "false"))
      assert(fromConf.droneSenseToken.value == "conf-token")
      assert(fromConf.debug) // conf beats env
      val fromOverride = Environment.resolve(spark,
        overrides = Map("token" -> "override-token", "debug" -> "false"),
        env = Map.empty)
      assert(fromOverride.droneSenseToken.value == "override-token")
      assert(!fromOverride.debug) // override beats conf
      spark.conf.unset(Environment.TokenConfKey)
      spark.conf.unset(Environment.DebugConfKey)
      val fromEnv = Environment.resolve(spark,
        env = Map(Environment.TokenEnvKey -> "env-token"))
      assert(fromEnv.droneSenseToken.value == "env-token")
    } finally {
      spark.conf.unset(Environment.TokenConfKey)
      spark.conf.unset(Environment.DebugConfKey)
    }
  }

  test("malformed DEBUG throws instead of silently defaulting") {
    val e = intercept[IllegalArgumentException] {
      Environment.resolve(spark,
        overrides = Map("token" -> token, "debug" -> "yep"), env = Map.empty)
    }
    assert(e.getMessage.contains("yep"))
    // accepted spellings
    assert(Environment.resolve(spark,
      overrides = Map("token" -> token, "debug" -> "1"), env = Map.empty).debug)
    assert(!Environment.resolve(spark,
      overrides = Map("token" -> token, "debug" -> "0"), env = Map.empty).debug)
  }

  test("DEBUG gates the verbose decode; payload logged, token never") {
    val payload = {
      val url = getClass.getResource("/graft/drones.json")
      scala.io.Source.fromURL(url, "UTF-8").mkString
    }
    var logged = Vector.empty[String]
    val quiet = DroneSense.parseJson(spark, payload, verbose = false,
      log = m => logged :+= m)
    assert(quiet.count() > 0)
    assert(logged.isEmpty, "verbose=false must not log")
    val loud = DroneSense.parseJson(spark, payload, verbose = true,
      log = m => logged :+= m)
    assert(loud.count() > 0)
    assert(logged.nonEmpty, "verbose=true must log the decoded sample")
    assert(logged.mkString.contains("callSign") || logged.mkString.contains("decoded"),
      s"log should carry record content: ${logged.mkString.take(200)}")
    assert(!logged.mkString.contains(token))
  }

  test("fromApi: control() end-to-end — token header sent, CoT rows out") {
    val payload = {
      val url = getClass.getResource("/graft/drones.json")
      scala.io.Source.fromURL(url, "UTF-8").mkString
    }
    @volatile var seenKey: String = null
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/drones", exchange => {
      seenKey = exchange.getRequestHeaders.getFirst("X-API-KEY")
      val bytes = payload.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val env = Environment.resolve(spark,
        overrides = Map("token" -> token, "debug" -> "true"), env = Map.empty)
      var logged = Vector.empty[String]
      val cot = DroneSense.fromApi(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/drones", env,
        log = m => logged :+= m)
      assert(cot.count() > 0)
      assert(seenKey == token, "X-API-KEY header must carry the secret value")
      assert(logged.nonEmpty, "debug=true must produce the verbose decode log")
    } finally server.stop(0)
  }
}
