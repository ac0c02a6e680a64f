package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/**
 * The reference's REST layer, actually listening on a port
 * (`controller/rest/ControllerRestApplication.java:40-43` and the
 * Restlet resources it mounts) — served by the JDK's built-in
 * `com.sun.net.httpserver` so the build stays zero-dependency.
 *
 * Routing (mirrors the Restlet attach table,
 * `ControllerRestApplication.java:40-69`):
 *  - `GET  /health`                      → liveness
 *  - `GET  /admin/workloadinfo`          → V1 status view ([[AdminApi.status]])
 *  - `POST /admin/{enable|disable}_autobalancing` → toggle (o6 gate)
 *  - `GET  /admin/autobalancing_status`  → the flag
 *  - `GET  /topics`                      → serving topic sets ([[AdminApi.topics]])
 *  - `POST /topics?pipeline=p&topic=t`   → whitelist (F1)
 *  - `DELETE /topics?pipeline=p&topic=t` → delete + blacklist (F2)
 *  - `POST /blacklist?pipeline=p&topic=t&partition=n` → partition blacklist (F5)
 *  - `PUT  /ratelimiter?rate=r`          → runtime rate change (R1)
 *  - `GET  /validation`                  → validation counters (A6 loop)
 *  - `GET  /noprogress`                  → stuck partitions (A2 view)
 *  - `GET  /offset[/{topic}/{partition}]` → per-TP offsets/lag (A1 view)
 *  - `GET  /instances[/{name}]`          → per-instance serving + workload
 *  - `GET  /groups`                      → consumer groups + idle ages (K3 view)
 *  - `DELETE /groups/{g}`                → release a group's retention pin (leader-gated)
 *  - `GET  /chaperone3/rawmetrics?startSec&endSec&topicList` → workload
 *    metrics JSON when a `metrics` provider is configured — the C3
 *    surface [[graft.sources.WorkloadRetriever.httpFetch]] queries
 *
 * All responses are the JSON the library API already returns; the HTTP
 * layer adds only transport. Driver-side control plane — never data.
 */
final class AdminHttpServer(
    api: AdminApi,
    validation: Option[ValidationService] = None,
    port: Int = 0,
    metrics: Option[(Long, Long, Seq[String]) => String] = None) {

  private var server: Option[HttpServer] = None

  /** The bound port (useful with `port = 0` for an ephemeral bind). */
  def boundPort: Int =
    server.map(_.getAddress.getPort)
      .getOrElse(throw new IllegalStateException("server not started"))

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    def p(name: String): Option[String] = params(ex).get(name)
    // malformed numeric params are the CLIENT's fault: 400, not a 500
    // from the generic handler
    def pInt(name: String): Option[Int] = p(name).flatMap(_.toIntOption)
    def pDouble(name: String): Option[Double] = p(name).flatMap(_.toDoubleOption)
    def badNumbers: Boolean =
      (p("partition").isDefined && pInt("partition").isEmpty) ||
        (p("rate").isDefined && pDouble("rate").isEmpty)
    try {
      if (badNumbers) {
        reply(ex, 400,
          """{"status":"error","message":"malformed numeric parameter"}""")
        return
      }
      // trailing-slash-tolerant path segments, like the reference's
      // duplicate `/x` + `/x/` attach rows
      val segs = path.split("/").filter(_.nonEmpty).toList
      val body = (method, segs) match {
        case ("GET", List("health")) => Some("""{"status":"ok"}""")
        case ("GET", List("admin", "workloadinfo")) => Some(api.status)
        case ("POST", List("admin", opt @ ("enable_autobalancing" | "disable_autobalancing"))) =>
          Some(api.setAutoBalancing(opt))
        case ("GET", List("admin", "autobalancing_status")) =>
          Some(api.autoBalancingStatus)
        case ("GET", List("noprogress")) => Some(api.noProgress)
        case ("GET", List("offset")) => Some(api.offsets())
        case ("GET", List("offset", topic, part)) =>
          // malformed partition segment is the client's fault: 400
          part.toIntOption match {
            case None => Some("""{"status":"error","message":"malformed partition"}""")
            case p => Some(api.offsets(Some(topic), p))
          }
        case ("GET", List("instances")) => Some(api.instances())
        case ("GET", List("instances", name)) => Some(api.instances(Some(name)))
        case ("GET", List("groups")) => Some(api.groupsJson)
        case ("DELETE", List("groups", group)) => Some(api.deleteGroup(group))
        case ("GET", List("chaperone3", "rawmetrics")) =>
          metrics.map { m =>
            (pInt("startSec"), pInt("endSec")) match {
              case (Some(s0), Some(s1)) =>
                m(s0.toLong, s1.toLong,
                  p("topicList").map(_.split(',').toSeq.filter(_.nonEmpty))
                    .getOrElse(Nil))
              case _ =>
                """{"status":"error","message":"startSec/endSec required"}"""
            }
          }
        case _ => (method, path) match {
          case ("GET", "/topics") => Some(api.topics)
          case ("POST", "/topics") =>
            for (pl <- p("pipeline"); t <- p("topic")) yield api.addTopic(pl, t)
          case ("DELETE", "/topics") =>
            for (pl <- p("pipeline"); t <- p("topic")) yield api.deleteTopic(pl, t)
          case ("POST", "/blacklist") =>
            for (pl <- p("pipeline"); t <- p("topic"); pt <- pInt("partition"))
              yield api.blacklistPartition(pl, t, pt)
          case ("PUT", "/ratelimiter") =>
            pDouble("rate").map(api.setRateLimit)
          case ("GET", "/validation") =>
            Some(validation.map(_.countersJson)
              .getOrElse("""{"status":"error","message":"no validation service"}"""))
          case _ => None
        }
      }
      body match {
        case Some(b) =>
          reply(ex, if (b.contains("\"status\":\"error\"")) 400 else 200, b)
        case None =>
          reply(ex, 404,
            """{"status":"error","message":"unknown route or missing params"}""")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        reply(ex, 500, s"""{"status":"error","message":${
          PipelineManager.jsonEscape(String.valueOf(e.getMessage))}}""")
    }
  }

  def start(): Unit = synchronized {
    require(server.isEmpty, "admin http server already running")
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/", handle(_))
    s.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-admin-http")
      t.setDaemon(true)
      t
    })
    s.start()
    server = Some(s)
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }
}
