package graft.adtl

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** S8 remote-schema fetch: a reachable URL is fetched and used for
  * validation; any failure (non-200, connection refused) warns and skips
  * validation, matching the reference (parser.py:329-346). */
class SchemaFetchSpec extends SparkSpec {

  private val schemaJson =
    """{"required": ["sid"],
       "properties": {"sid": {"type": "string"}, "v": {"type": "integer"}}}"""

  private def specFor(url: String): String =
    s"""{"adtl": {"name": "s", "description": "d",
        "tables": {"t": {"kind": "oneToOne", "schema": "$url"}}},
        "t": {"sid": {"field": "sid"}, "v": {"field": "v"}}}"""

  private def withServer(status: Int, body: String)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schema.json", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/schema.json")
    finally server.stop(0)
  }

  private def src = {
    import spark.implicits._
    Seq(("A", "7"), ("B", "x")).toDF("sid", "v")
  }

  test("S8: reachable schema URL is fetched and drives validation") {
    withServer(200, schemaJson) { url =>
      val parser = AdtlParser.fromSpec(SpecLoader.parseJson(specFor(url)))
      val out = parser.parseDataFrame(spark, src)("t")
      assert(out.columns.contains("adtl_valid"))
      val rows = out.orderBy("sid").collect()
      assert(rows(0).getAs[Boolean]("adtl_valid"))
      assert(!rows(1).getAs[Boolean]("adtl_valid")) // "x" fails type integer
      assert(rows(1).getAs[String]("adtl_error") == "data.v must be integer")
    }
  }

  test("S8: non-200 response warns and skips validation") {
    withServer(404, "not here") { url =>
      val parser = AdtlParser.fromSpec(SpecLoader.parseJson(specFor(url)))
      val out = parser.parseDataFrame(spark, src)("t")
      assert(!out.columns.contains("adtl_valid"))
    }
  }

  test("S8: unreachable host warns and skips validation") {
    // a port we just closed — connection refused
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    server.start(); server.stop(0)
    val parser = AdtlParser.fromSpec(
      SpecLoader.parseJson(specFor(s"http://127.0.0.1:$port/schema.json")))
    val out = parser.parseDataFrame(spark, src)("t")
    assert(!out.columns.contains("adtl_valid"))
  }
}
