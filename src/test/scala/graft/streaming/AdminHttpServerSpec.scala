package graft.streaming

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite

/** The REST layer actually serving on a port: every mounted route hits
  * the same library API the other specs cover; this spec checks the
  * transport — methods, params, status codes, JSON bodies. */
class AdminHttpServerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def withServer(f: (String, PipelineManager) => Unit): Unit = {
    val m = new PipelineManager(spark)
    m.update(PipelineSpec(name = "r1", route = Route("a", "b", 0),
      topics = Seq("click")))
    val validation = new ValidationService(
      () => Seq(("w1", "t", 0, "ONLINE")).toDF("instance", "topic", "partition", "state"),
      () => Seq(("w1", "t", 0, "ONLINE")).toDF("instance", "topic", "partition", "state"))
    validation.validateOnce()
    val srv = new AdminHttpServer(new AdminApi(m), Some(validation))
    srv.start()
    try f(s"http://127.0.0.1:${srv.boundPort}", m)
    finally srv.stop()
  }

  private val client = HttpClient.newHttpClient()
  private def call(method: String, url: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.noBody()).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET routes serve the library views") {
    withServer { (base, _) =>
      assert(call("GET", s"$base/health") == (200, """{"status":"ok"}"""))
      val (sc, body) = call("GET", s"$base/topics")
      assert(sc == 200 && body.contains("\"r1\"") && body.contains("click"))
      val (vc, vbody) = call("GET", s"$base/validation")
      assert(vc == 200 && vbody.contains("\"numMismatchedAssignments\":0"))
      assert(call("GET", s"$base/admin/workloadinfo")._1 == 200)
    }
  }

  test("topic add/delete round-trip through HTTP mutates the manager") {
    withServer { (base, m) =>
      val (sc, _) = call("POST", s"$base/topics?pipeline=r1&topic=view")
      assert(sc == 200)
      assert(m.spec("r1").get.topics == Seq("click", "view"))
      // duplicate add → 400 with the library's error body
      val (dup, dupBody) = call("POST", s"$base/topics?pipeline=r1&topic=view")
      assert(dup == 400 && dupBody.contains("already whitelisted"))
      val (dc, _) = call("DELETE", s"$base/topics?pipeline=r1&topic=click")
      assert(dc == 200)
      assert(m.spec("r1").get.topics == Seq("view"))
      assert(m.spec("r1").get.topicBlacklist == Set("click"))
    }
  }

  test("partition blacklist and unknown routes") {
    withServer { (base, m) =>
      val (sc, _) =
        call("POST", s"$base/blacklist?pipeline=r1&topic=click&partition=3")
      assert(sc == 200)
      assert(m.spec("r1").get.partitionBlacklist == Set(("click", 3)))
      assert(call("GET", s"$base/nope")._1 == 404)
      // missing params → 404 (unroutable), not a 500
      assert(call("POST", s"$base/topics?pipeline=r1")._1 == 404)
      // malformed numerics are the client's fault: 400, never 500
      val (bp, bpBody) =
        call("POST", s"$base/blacklist?pipeline=r1&topic=t&partition=abc")
      assert(bp == 400 && bpBody.contains("malformed numeric"))
      assert(call("PUT", s"$base/ratelimiter?rate=fast")._1 == 400)
    }
  }
}
