package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.ml.Churn
import graft.serve.ScoreServer

/** End-to-end HTTP contract tests for the scoring service: a real
  * server on an ephemeral loopback port, hit with the JDK HttpClient,
  * responses compared against direct [[Churn.Scorer]] calls.
  */
class ServeSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def withServer[A](f: Int => A): A = {
    val srv = new ScoreServer(spark, Churn.scorer(spark, sf))
    val port = srv.start()
    try f(port)
    finally srv.stop()
  }

  private def get(port: Int, path: String) =
    client.send(
      HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String) =
    client.send(
      HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())

  test("health and schema report the feature contract") {
    withServer { port =>
      val health = mapper.readTree(get(port, "/health").body())
      assert(health.get("status").asText() === "ok")
      assert(health.get("threshold").asDouble() === 0.5)
      val feats = health.get("features").elements()
      val names = Iterator.continually(feats).takeWhile(_.hasNext).map(_.next().asText()).toSeq
      assert(names === Churn.featureCols)
      val schema = mapper.readTree(get(port, "/schema").body())
      assert(schema.get("required_features").size() === Churn.featureCols.size)
    }
  }

  test("predict matches a direct Scorer call; missing/unknown/garbage features coerce") {
    withServer { port =>
      val body =
        """{"features": {"total_orders": 3.0, "unknown_feature": 99.0,
          |  "recency_days": "not-a-number"}}""".stripMargin
      val resp = mapper.readTree(post(port, "/predict", body).body())
      assert(resp.get("n").asInt() === 1)
      val r = resp.get("results").get(0)
      val (p1, pred) = Churn.scorer(spark, sf)
        .scoreOne(spark, Map("total_orders" -> 3.0, "recency_days" -> 0.0))
      assert(r.get("probability").asDouble() === p1)
      assert(r.get("prediction").asInt() === pred.toInt)
    }
  }

  test("predict_batch returns per-item results in order; empty batch is n=0") {
    withServer { port =>
      val body =
        """{"items": [{"features": {"total_orders": 1.0}},
          |           {"features": {"total_orders": 9.0, "total_amount": 500.0}}]}""".stripMargin
      val resp = mapper.readTree(post(port, "/predict_batch", body).body())
      assert(resp.get("n").asInt() === 2)
      assert(resp.get("results").size() === 2)
      (0 until 2).foreach { i =>
        val p = resp.get("results").get(i).get("probability").asDouble()
        assert(p >= 0.0 && p <= 1.0)
      }
      val empty = mapper.readTree(post(port, "/predict_batch", """{"items": []}""").body())
      assert(empty.get("n").asInt() === 0)
      assert(empty.get("results").size() === 0)
    }
  }

  test("GET on a POST endpoint is a 405, malformed JSON and empty bodies are 400") {
    withServer { port =>
      assert(get(port, "/predict").statusCode() === 405)
      assert(post(port, "/predict", "{not json").statusCode() === 400)
      assert(post(port, "/predict", "").statusCode() === 400)
    }
  }
}
