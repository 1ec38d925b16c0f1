package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.json.JsonValue

/** HTTP transport for [[JsonApi]] on the reference server's routes
  * (`server/src/main.rs:133-146`):
  *
  * {{{
  *   GET    /v1/table                       list tables
  *   PUT    /v1/table/{name}                create table
  *   DELETE /v1/table/{name}                delete table
  *   POST   /v1/table/{name}/write          batch write
  *   POST   /v1/table/{name}/rows           multi-get
  *   POST   /v1/table/{name}/scan           scan
  *   POST   /v1/table/{name}/count          count
  *   POST   /v1/table/{name}/column-family  create column families
  *   DELETE /v1/table/{name}/row            filtered row delete
  *   GET    /v1/table/{name}/metrics        registered; unimplemented upstream
  *   GET    /  or  /index.html              metrics dashboard (HTML)
  * }}}
  *
  * (`GET /v1/table/{name}/metrics` is `unimplemented!()` upstream past its
  * table-existence check — `server/src/api/metrics.rs:29-44` — so the route
  * here reproduces exactly the reachable behavior: 404 envelope for unknown
  * tables, plain 500 for known ones.)
  *
  * Built on the JDK's `com.sun.net.httpserver` — zero new dependencies in
  * the zero-egress build. The HTTP status code mirrors the envelope's
  * `status` field (`server/src/response.rs:6-19`); unexpected failures
  * produce the reference's plain-text 500
  * (`server/src/error.rs:12-16`).
  *
  * `port = 0` binds an ephemeral port (tests); the reference defaults to
  * 9876 (`server/src/main.rs:53`).
  */
final class HttpApiServer(api: JsonApi, port: Int = 9876) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", new Router)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  def boundPort: Int = server.getAddress.getPort

  def start(): Int = { server.start(); boundPort }

  def stop(): Unit = server.stop(0)

  private final class Router extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val path = ex.getRequestURI.getPath
        if (ex.getRequestMethod == "GET" &&
            (path == "/" || path == "/index.html")) {
          // reference routes `/` and `/index.html` to the dashboard
          // (`server/src/main.rs:133-134`)
          respond(ex, 200, "text/html", api.dashboardHtml())
          return
        }
        route(ex.getRequestMethod, path, body) match {
          case Some(envelope) =>
            val status = JsonValue.parse(envelope).get("status")
              .map(_.asLong.toInt).getOrElse(200)
            respond(ex, status, "application/json", envelope)
          case None =>
            respond(ex, 404, "text/plain", "Not Found")
        }
      } catch {
        case _: Throwable =>
          // reference: ResponseError -> plain 500 (`server/src/error.rs`)
          respond(ex, 500, "text/plain", "Internal Server Error")
      } finally ex.close()
    }

    private def respond(ex: HttpExchange, status: Int, contentType: String,
        body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", contentType)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }

    private def route(method: String, path: String,
        body: String): Option[String] = {
      val segs = path.split("/").filter(_.nonEmpty)
      (method, segs) match {
        case ("GET", Array("v1", "table"))            => Some(api.listTables())
        case ("PUT", Array("v1", "table", name))      => Some(api.createTable(name))
        case ("DELETE", Array("v1", "table", name))   => Some(api.deleteTable(name))
        case ("DELETE", Array("v1", "table", name, "row")) =>
          Some(api.deleteRow(name, body))
        case ("POST", Array("v1", "table", name, "write")) =>
          Some(api.write(name, body))
        case ("POST", Array("v1", "table", name, "rows")) =>
          Some(api.getRows(name, body))
        case ("POST", Array("v1", "table", name, "scan")) =>
          Some(api.scan(name, body))
        case ("POST", Array("v1", "table", name, "count")) =>
          Some(api.count(name, body))
        case ("POST", Array("v1", "table", name, "column-family")) =>
          Some(api.createColumnFamilies(name, body))
        case ("GET", Array("v1", "table", name, "metrics")) =>
          Some(api.tableMetrics(name))
        case _ => None
      }
    }
  }
}
