package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.ml.Churn

/** Minimal HTTP scoring service — the Spark-side twin of the
  * reference's FastAPI layer (serve_api.py:177-221), built on the
  * JDK's own HttpServer and the Jackson that ships with Spark, so the
  * library stays dependency-free.
  *
  * Contract parity with the reference:
  *   - GET  /health        → {status, features, threshold}
  *   - GET  /schema        → {required_features}
  *   - POST /predict       {"features": {...}}    → one result
  *   - POST /predict_batch {"items": [{"features": {...}}, ...]}
  *     → {n, threshold, results: [{probability, prediction}]}
  * Unknown features are ignored, missing ones default to 0.0,
  * non-numeric values coerce like the reference's float() fallback
  * (serve_api.py:120-131) — all of that lives in [[Churn.Scorer]],
  * which this class only adapts to HTTP.
  *
  * Ops note: scoring runs on the driver's SparkSession (exactly the
  * reference's deployment shape). The server binds loopback by
  * default; production fronting (TLS, auth, load shedding) belongs in
  * whatever gateway sits ahead of it.
  */
final class ScoreServer(
    spark: SparkSession,
    scorer: Churn.Scorer,
    port: Int = 0,
    host: String = "127.0.0.1") {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)

  /** Start serving; returns the actual bound port (ephemeral when
    * constructed with port 0).
    */
  def start(): Int = {
    server.createContext("/health", (ex: HttpExchange) => handle(ex) { _ =>
      val o = mapper.createObjectNode()
      o.put("status", "ok")
      val fs = o.putArray("features")
      Churn.featureCols.foreach(fs.add)
      o.put("threshold", scorer.threshold)
      o
    })
    server.createContext("/schema", (ex: HttpExchange) => handle(ex) { _ =>
      val o = mapper.createObjectNode()
      val fs = o.putArray("required_features")
      Churn.featureCols.foreach(fs.add)
      o
    })
    server.createContext("/predict", (ex: HttpExchange) => handle(ex, post = true) { body =>
      respond(Seq(featureMap(body.get("features"))))
    })
    server.createContext("/predict_batch", (ex: HttpExchange) => handle(ex, post = true) { body =>
      val items = Option(body.get("items")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      respond(items.map(it => featureMap(it.get("features"))))
    })
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  /** The reference's coercion (serve_api.py:120-131): keep known
    * features, float() what parses, 0.0 for everything else.
    */
  private def featureMap(node: JsonNode): Map[String, Double] =
    if (node == null) Map.empty
    else node.fields().asScala.map { e =>
      val v = e.getValue
      val d =
        if (v.isNumber) v.asDouble()
        else try v.asText().toDouble catch { case _: Throwable => 0.0 }
      e.getKey -> d
    }.toMap

  private def respond(batch: Seq[Map[String, Double]]): JsonNode = {
    val o = mapper.createObjectNode()
    o.put("n", batch.size)
    o.put("threshold", scorer.threshold)
    val rs = o.putArray("results")
    if (batch.nonEmpty) {
      scorer.scoreBatch(spark, batch).select("p1", "prediction").collect().foreach { r =>
        val one = rs.addObject()
        one.put("probability", r.getDouble(0))
        one.put("prediction", r.getDouble(1).toInt)
      }
    }
    o
  }

  /** Client faults (bad method, unparseable JSON) are 4xx; anything
    * the handler throws while scoring is a 500 with a generic body —
    * a broken Spark session must not masquerade as bad input (retry /
    * alerting logic keys on the class), and internal messages are not
    * leaked to clients. Fatal errors propagate.
    */
  private def handle(ex: HttpExchange, post: Boolean = false)(f: JsonNode => JsonNode): Unit =
    try {
      if (post && ex.getRequestMethod != "POST") {
        write(ex, 405, errorNode("use POST"))
      } else {
        val parsed =
          if (post)
            try Right(mapper.readTree(new String(
              ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)))
            catch {
              case e: com.fasterxml.jackson.core.JacksonException =>
                Left(String.valueOf(e.getOriginalMessage))
            }
          else Right(mapper.createObjectNode(): JsonNode)
        parsed match {
          case Left(msg) => write(ex, 400, errorNode(s"malformed JSON: $msg"))
          // readTree of an empty body: null on old Jackson, MissingNode
          // on 2.10+ — either way a client fault, not a scorable request
          case Right(body) if body == null || body.isMissingNode =>
            write(ex, 400, errorNode("malformed JSON: empty body"))
          case Right(body) =>
            try write(ex, 200, f(body))
            catch {
              case scala.util.control.NonFatal(_) =>
                write(ex, 500, errorNode("internal error"))
            }
        }
      }
    } finally ex.close()

  private def errorNode(msg: String): JsonNode = {
    val o = mapper.createObjectNode(); o.put("detail", msg); o
  }

  private def write(ex: HttpExchange, code: Int, node: JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }
}
