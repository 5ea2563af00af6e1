package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end exercise of the REAL URL fetch path (S2) against a loopback
  * HTTP server — the sandbox has no egress, but 127.0.0.1 needs none, so
  * the production code path (timeouts, chunked streaming, mid-stream cap,
  * header-driven naming) runs for real instead of staying a seam. */
class UrlFetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => try h(ex) finally ex.close())
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, bytes: Array[Byte],
      headers: Map[String, String] = Map.empty, code: Int = 200): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  test("basic fetch: bytes round-trip, filename from URL basename") {
    val payload = Array.tabulate[Byte](20000)(i => (i % 251).toByte)
    withServer(Map("/files/report.pdf" -> (ex => respond(ex, payload,
        Map("Content-Type" -> "application/pdf"))))) { base =>
      val f = UrlFetch.fetch(s"$base/files/report.pdf")
      assert(f.content.toSeq == payload.toSeq)
      assert(f.filename == "report.pdf")
      assert(UrlMeta.kindOf(f.filename) == "pdf")
    }
  }

  test("content-disposition filename wins over the URL") {
    withServer(Map("/dl" -> (ex => respond(ex, "x".getBytes,
        Map("Content-Disposition" -> "attachment; filename=\"scan 01.pdf\""))))) { base =>
      assert(UrlFetch.fetch(s"$base/dl?id=7").filename == "scan 01.pdf")
    }
  }

  test("extensionless URL + image content-type → .jpg (reference guess chain)") {
    withServer(Map("/img" -> (ex => respond(ex, Array[Byte](1, 2, 3),
        Map("Content-Type" -> "image/png"))))) { base =>
      val f = UrlFetch.fetch(s"$base/img")
      assert(f.filename == "img.jpg")
      assert(UrlMeta.kindOf(f.filename) == "image")
    }
  }

  test("mid-stream cap: over-size body aborts while still streaming") {
    // chunked response (length 0 = unknown): the fetch cannot know the
    // size up front, so only the running-count check can stop it — the
    // handler counts what it managed to write before the client hung up
    val written = new java.util.concurrent.atomic.AtomicLong()
    withServer(Map("/big" -> { ex =>
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      val chunk = new Array[Byte](8192)
      try {
        var i = 0
        while (i < 4096) { os.write(chunk); os.flush(); written.addAndGet(chunk.length); i += 1 }
      } catch { case _: java.io.IOException => () } // client aborted — expected
    })) { base =>
      val cap = 256L * 1024
      val e = intercept[FetchTooLargeException](
        UrlFetch.fetch(s"$base/big", maxBytes = cap))
      assert(e.max == cap)
      // the reference's message shape (413 detail, main.py:292)
      assert(e.getMessage.contains("File too large"))
    }
    // the server was trying to send 32 MB; the client must have cut the
    // connection long before that arrived
    assert(written.get() < 32L * 1024 * 1024, s"server wrote ${written.get()}")
  }

  test("redirects are followed (requests.get semantics); filename from the ORIGINAL url") {
    withServer(Map(
      "/old/scan.pdf" -> { ex =>
        ex.getResponseHeaders.add("Location", "/new/moved.bin")
        ex.sendResponseHeaders(302, -1)
      },
      "/new/moved.bin" -> (ex => respond(ex, "final".getBytes)))) { base =>
      val f = UrlFetch.fetch(s"$base/old/scan.pdf")
      assert(new String(f.content) == "final")
      // main.py:271 infers from the url ARGUMENT, not the redirect target
      assert(f.filename == "scan.pdf")
    }
  }

  test("redirect loops terminate with the wrapped failure") {
    withServer(Map("/loop" -> { ex =>
      ex.getResponseHeaders.add("Location", "/loop")
      ex.sendResponseHeaders(302, -1)
    })) { base =>
      val e = intercept[FetchFailedException](UrlFetch.fetch(s"$base/loop"))
      // same-protocol loops are cut by the JDK's own redirect limit
      // ("Server redirected too many times"); cross-protocol loops by our
      // manual hop counter — either way the declared failure type with a
      // redirect-limit message
      assert(e.getMessage.toLowerCase.contains("redirect"))
    }
  }

  test("malformed and non-http URLs raise the declared failure type") {
    intercept[FetchFailedException](UrlFetch.fetch("ht tp://bad host/x"))
    intercept[FetchFailedException](UrlFetch.fetch("file:///etc/hostname"))
  }

  test("non-2xx raises the wrapped failure (raise_for_status semantics)") {
    withServer(Map("/gone" -> (ex => respond(ex, "nope".getBytes, code = 404)))) { base =>
      val e = intercept[FetchFailedException](UrlFetch.fetch(s"$base/gone"))
      assert(e.getMessage.contains("HTTP 404"))
    }
  }

  test("read timeout maps to the wrapped transport failure") {
    withServer(Map("/slow" -> { ex =>
      Thread.sleep(3000)
      respond(ex, "late".getBytes)
    })) { base =>
      val e = intercept[FetchFailedException](
        UrlFetch.fetch(s"$base/slow", timeoutMs = 300))
      assert(e.getCause.isInstanceOf[java.net.SocketTimeoutException])
    }
  }
}
