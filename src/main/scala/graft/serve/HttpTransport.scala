package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer, HttpsConfigurator, HttpsServer}
import graft.Graft
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import javax.net.ssl.{KeyManagerFactory, SSLContext}

/** HTTP transport — the reference's Flask surface
  * (mcp_server/http_server.py:16-73) on the JDK's built-in server (zero
  * added dependencies; the reference needed Flask):
  *
  *   GET  /health
  *   GET  /api/<collection>/status/vector
  *   GET  /api/<collection>/status/fts
  *   POST /api/<collection>/search/hybrid   {query, n_results, mode}
  *
  * One warm engine per collection, opened ONCE at construction — the
  * per-request index reopen the reference pays (tools.py:53-57) is the
  * inefficiency this engine's whole serving design removes. Requests
  * execute on the server's executor threads; the engines' search paths
  * are thread-safe (resident caches are read-only after build, Spark
  * jobs multiplex). Port 0 binds an ephemeral port (tests).
  *
  * `tls = Some(...)` serves HTTPS instead — the reference's dev runner
  * does the same (http_server.py:78-80 passes a bundled self-signed
  * `ssl_context=('cert/cert.pem','cert/key.pem')`); here the JDK's
  * [[HttpsServer]] wraps the identical handler tree, keyed from a
  * PKCS12 keystore ([[HttpTransport.Tls]] — the caller's production
  * keystore, or the bundled DEV-ONLY self-signed localhost cert that
  * mirrors the reference's committed `cert/` pair). */
final class HttpTransport(collections: Map[String, Graft.HadithEngine],
                          port: Int = 8000,
                          tls: Option[HttpTransport.Tls] = None) {
  private val server = tls match {
    case None => HttpServer.create(new InetSocketAddress(port), 0)
    case Some(t) =>
      val s = HttpsServer.create(new InetSocketAddress(port), 0)
      s.setHttpsConfigurator(new HttpsConfigurator(HttpTransport.sslContext(t)))
      s
  }
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(f: HttpExchange => (Int, String)): HttpHandler =
    (ex: HttpExchange) =>
      try { val (c, b) = f(ex); respond(ex, c, b) }
      catch {
        case e: Throwable =>
          // a respond() that failed mid-write (client reset) cannot
          // send a second set of headers — swallow that, the exchange
          // close below is what actually matters
          try respond(ex, 500, ServeJson.err(e.toString).toString)
          catch { case _: Throwable => () }
      } finally ex.close()

  server.createContext("/health", handle(_ => (200, """{"ok":true}""")))

  server.createContext("/api", handle { ex =>
    // /api/<collection>/<verb...>
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
    if (parts.length < 3) (404, ServeJson.err("not found").toString)
    else collections.get(parts(1)) match {
      case None => (404, ServeJson.err(s"unknown collection ${parts(1)}").toString)
      case Some(eng) =>
        (ex.getRequestMethod, parts.drop(2).toList) match {
          case ("GET", List("status", "vector")) =>
            (200, ServeJson.vectorStatus(eng).toString)
          case ("GET", List("status", "fts")) =>
            (200, ServeJson.ftsStatus(eng).toString)
          case ("POST", List("search", "hybrid")) =>
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val node = ServeJson.mapper.readTree(if (body.isEmpty) "{}" else body)
            val query = Option(node.get("query")).map(_.asText()).filter(_.nonEmpty)
            query match {
              case None => (400, ServeJson.err("Missing 'query'").toString)
              case Some(q) =>
                val n = Option(node.get("n_results")).map(_.asInt()).getOrElse(10)
                val mode = Option(node.get("mode")).map(_.asText()).getOrElse("balanced")
                (200, ServeJson.searchEnvelopeTyped(eng, q, n, mode).toString)
            }
          case _ => (404, ServeJson.err("not found").toString)
        }
    }
  })

  server.start()
  /** The bound port (differs from the requested one when 0/ephemeral). */
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object HttpTransport {
  /** TLS keying: a PKCS12 keystore path + password, or (both defaults)
    * the bundled DEV-ONLY self-signed localhost certificate — the JDK
    * analog of the reference's committed `cert/cert.pem`+`key.pem`
    * pair (mcp_server/http_server.py:78-80). The bundled store is for
    * local dev/tests exactly like the reference's; production callers
    * pass their own keystore. */
  final case class Tls(keystorePath: Option[String] = None,
                       password: String = "graftdev")

  private[serve] def sslContext(tls: Tls): SSLContext = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = tls.keystorePath match {
      case Some(p) => new java.io.FileInputStream(p)
      case None =>
        // the bundled key pair is REPOSITORY-PUBLIC (exactly like the
        // reference's committed cert/ dir): it encrypts the transport
        // but authenticates NOTHING — any MITM can present the same
        // key. Refuse to let that pass silently outside local dev.
        System.err.println(
          "WARNING: TLS keyed from the BUNDLED DEV certificate — the " +
            "private key is public in the repository, so this provides " +
            "no authenticity. Pass Tls(keystorePath = ...) with a real " +
            "keystore for anything beyond localhost development.")
        val r = getClass.getResourceAsStream("/graft/serve/dev-keystore.p12")
        require(r != null, "bundled dev keystore missing from classpath")
        r
    }
    try ks.load(in, tls.password.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, tls.password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}

/** `python3 -m mcp_server.http_server` analog:
  * runMain graft.serve.HttpMain <booksGlob> [port] [--tls]
  * (`--tls` serves HTTPS off the bundled dev certificate, like the
  * reference's ssl_context dev runner). */
object HttpMain {
  def main(args: Array[String]): Unit = {
    val glob = args.headOption.getOrElse("/root/reference/data/riyadussalihin/book_*.jsonl")
    val port = args.lift(1).flatMap(_.toIntOption).getOrElse(8000)
    val tls = if (args.contains("--tls")) Some(HttpTransport.Tls()) else None
    val spark = graft.GraftSession.local("graft-http")
    val eng = Graft.openHadith(spark, glob)
    val t = new HttpTransport(Map("riyadussalihin" -> eng), port, tls)
    graft.GraftSession.tuneForServing(spark)
    eng.searchTyped("warm", 1) // build the resident layers before traffic
    System.err.println(
      s"graft ${if (tls.isDefined) "https" else "http"} serving on :${t.boundPort}")
    Thread.currentThread.join() // serve until killed
  }
}
