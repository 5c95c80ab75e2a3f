package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.Graft
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

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
  * jobs multiplex). Port 0 binds an ephemeral port (tests). */
final class HttpTransport(collections: Map[String, Graft.HadithEngine],
                          port: Int = 8000) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
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

/** `python3 -m mcp_server.http_server` analog:
  * runMain graft.serve.HttpMain <booksGlob> [port] */
object HttpMain {
  def main(args: Array[String]): Unit = {
    val glob = args.headOption.getOrElse("/root/reference/data/riyadussalihin/book_*.jsonl")
    val port = args.lift(1).flatMap(_.toIntOption).getOrElse(8000)
    val spark = graft.GraftSession.local("graft-http")
    val eng = Graft.openHadith(spark, glob)
    val t = new HttpTransport(Map("riyadussalihin" -> eng), port)
    graft.GraftSession.tuneForServing(spark)
    eng.searchTyped("warm", 1) // build the resident layers before traffic
    System.err.println(s"graft http serving on :${t.boundPort}")
    Thread.currentThread.join() // serve until killed
  }
}
