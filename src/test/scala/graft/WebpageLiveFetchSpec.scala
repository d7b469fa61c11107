package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer

/** Live-mode fetch for the `webpage` V2 source, exercised against a
  * loopback HTTP server (no egress): 2xx bodies come back decoded per
  * the Content-Type charset, non-2xx and unreachable URLs degrade to
  * the S3 zero-rows tolerance, and fixture mode stays the default.
  */
class WebpageLiveFetchSpec extends SparkTestBase {

  private def withServer(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/ok",
      exchange => {
        val body =
          "<html><body><h1>live page</h1></body></html>"
            .getBytes(StandardCharsets.UTF_8)
        exchange.getResponseHeaders
          .add("Content-Type", "text/html; charset=UTF-8")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
        exchange.close()
      })
    server.createContext(
      "/missing",
      exchange => {
        exchange.sendResponseHeaders(404, -1)
        exchange.close()
      })
    server.createContext(
      "/latin1",
      exchange => {
        // Non-UTF-8 page: the title is "Amélie" in ISO-8859-1 (é is the
        // single byte 0xE9, which is NOT valid UTF-8) — decoding with
        // the wrong charset cannot round-trip it.
        val body = "<html><body><h1>Amélie</h1></body></html>"
          .getBytes(StandardCharsets.ISO_8859_1)
        exchange.getResponseHeaders
          .add("Content-Type", "text/html; charset=ISO-8859-1")
        exchange.sendResponseHeaders(200, body.length)
        exchange.getResponseBody.write(body)
        exchange.close()
      })
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("live mode fetches 2xx pages and skips failed sources") {
    withServer { port =>
      val base = s"http://127.0.0.1:$port"
      val rows = spark.read
        .format("graft.sources.WebpageDataSource")
        .option("mode", "live")
        .option(
          "urls",
          s"$base/ok,$base/missing,http://127.0.0.1:1/unreachable")
        .load()
        .collect()
      // One partition per URL; only the 2xx one yields a row.
      assert(rows.length == 1)
      assert(rows(0).getString(0) == s"$base/ok")
      assert(rows(0).getString(1).contains("live page"))
    }
  }

  test("live mode decodes bodies per the declared Content-Type charset") {
    withServer { port =>
      val rows = spark.read
        .format("graft.sources.WebpageDataSource")
        .option("mode", "live")
        .option("urls", s"http://127.0.0.1:$port/latin1")
        .load()
        .collect()
      assert(rows.length == 1)
      assert(
        rows(0).getString(1).contains("Amélie"),
        "ISO-8859-1 body must decode via the declared charset")
    }
  }

  test("charsetOf: declared charset, quoted form, fallback, unknown") {
    import graft.sources.WebpageDataSource.charsetOf
    assert(charsetOf(Some("text/html; charset=ISO-8859-1"))
      == StandardCharsets.ISO_8859_1)
    assert(charsetOf(Some("text/html; charset=\"utf-8\""))
      == StandardCharsets.UTF_8)
    assert(charsetOf(Some("text/html")) == StandardCharsets.UTF_8)
    assert(charsetOf(None) == StandardCharsets.UTF_8)
    assert(charsetOf(Some("text/html; charset=no-such-charset"))
      == StandardCharsets.UTF_8)
  }

  test("unknown mode values are rejected, not silently fixture") {
    val err = intercept[Exception] {
      spark.read
        .format("graft.sources.WebpageDataSource")
        .option("mode", "Live")
        .load()
        .collect()
    }
    assert(err.getMessage.contains("mode must be"))
  }

  test("fixture mode remains the default") {
    val rows = spark.read
      .format("graft.sources.WebpageDataSource")
      .load()
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1).nonEmpty))
  }
}
