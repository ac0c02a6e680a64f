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

  test("autobalancing pause/resume round-trips (AdminRestletResource:54-88)") {
    withServer { (base, _) =>
      assert(call("GET", s"$base/admin/autobalancing_status") ==
        (200, """{"auto_balancing":true}"""))
      val (dc, dBody) = call("POST", s"$base/admin/disable_autobalancing")
      assert(dc == 200 && dBody.contains(""""auto_balancing":false"""))
      assert(call("GET", s"$base/admin/autobalancing_status")._2
        .contains("false"))
      assert(call("POST", s"$base/admin/enable_autobalancing")._2
        .contains(""""auto_balancing":true"""))
      // an unknown opt is not a route
      assert(call("POST", s"$base/admin/explode_autobalancing")._1 == 404)
    }
  }

  // monitor feeds: t/0 is stuck (commit frozen at 5 across snapshots
  // with lag), t/1 progresses; ideal assigns both to w1, external has
  // t/0 actually on w2
  private def monitorFeeds = {
    import org.apache.spark.sql.DataFrame
    val snapshots: () => DataFrame = () => Seq(
      ("t", 0, 100L, 5L, 50L), ("t", 0, 200L, 5L, 60L),
      ("t", 1, 100L, 9L, 20L), ("t", 1, 200L, 15L, 25L))
      .toDF("topic", "partition", "snap_ts", "commit_offset", "latest_offset")
    val latest: () => DataFrame = () =>
      Seq(("t", 0, 60L), ("t", 1, 25L))
        .toDF("topic", "partition", "latest_offset")
    val committed: () => DataFrame = () =>
      Seq(("t", 0, 5L), ("t", 1, 15L)).toDF("topic", "partition", "commit_offset")
    val ideal: () => DataFrame = () =>
      Seq(("w1", "t", 0, "ONLINE"), ("w1", "t", 1, "ONLINE"))
        .toDF("instance", "topic", "partition", "state")
    val external: () => DataFrame = () =>
      Seq(("w2", "t", 0, "ONLINE"), ("w1", "t", 1, "ONLINE"))
        .toDF("instance", "topic", "partition", "state")
    val workload: () => DataFrame = () =>
      Seq(("t", 0, 800.0), ("t", 1, 800.0))
        .toDF("topic", "partition", "bytes_per_sec")
    AdminApi.MonitorFeeds(snapshots, latest, committed, ideal, external, workload)
  }

  private def withMonitorServer(f: String => Unit): Unit = {
    val m = new PipelineManager(spark)
    val srv = new AdminHttpServer(
      new AdminApi(m, feeds = Some(monitorFeeds)))
    srv.start()
    try f(s"http://127.0.0.1:${srv.boundPort}") finally srv.stop()
  }

  test("GET /noprogress serves the A2 view with ideal/actual workers") {
    withMonitorServer { base =>
      val (sc, body) = call("GET", s"$base/noprogress")
      assert(sc == 200)
      assert(body == """{"topics":[{"topic":"t","partition":0,""" +
        """"idealWorker":"w1","actualWorker":"w2"}]}""")
    }
  }

  test("GET /offset serves the A1 lag view, per-TP and all") {
    withMonitorServer { base =>
      val (sc, body) = call("GET", s"$base/offset/t/0")
      assert(sc == 200)
      assert(body == """{"offsets":[{"topic":"t","partition":0,""" +
        """"latestOffset":60,"commitOffset":5,"lag":55}]}""")
      val (ac, aBody) = call("GET", s"$base/offset")
      assert(ac == 200 && aBody.contains(""""partition":1"""))
      // unknown TP → 400 error body; malformed partition → 400
      assert(call("GET", s"$base/offset/t/7")._1 == 400)
      assert(call("GET", s"$base/offset/t/seven")._1 == 400)
    }
  }

  test("GET /instances serves per-instance serving sets with workload") {
    withMonitorServer { base =>
      val (sc, body) = call("GET", s"$base/instances")
      assert(sc == 200)
      assert(body.contains(""""w2":["t.0:800","TOTALWORKLOAD.1:800"]"""))
      assert(body.contains(""""allInstances":["w1","w2"]"""))
      val (oc, oBody) = call("GET", s"$base/instances/w1")
      assert(oc == 200 && oBody.contains("w1") &&
        !oBody.contains(""""w2":["""))
    }
  }

  test("monitor routes without feeds configured answer an error, not a 500") {
    withServer { (base, _) =>
      val (sc, body) = call("GET", s"$base/noprogress")
      assert(sc == 400 && body.contains("no monitor feeds"))
    }
  }

  test("GET /groups + DELETE /groups/{g}: group governance over HTTP") {
    import graft.sources.FileTopicLog
    val root = graft.SessionTemp.dir("graft_admin_groups_")
    FileTopicLog.registerGroup(root, "etl")
    FileTopicLog.registerGroup(root, "audit")
    val expiry = new GroupExpiryService(root, ttlMillis = 1L)
    val leader = new java.util.concurrent.atomic.AtomicBoolean(true)
    val m = new PipelineManager(spark)
    val srv = new AdminHttpServer(new AdminApi(m, groupRoot = Some(root),
      expiry = Some(expiry), isLeader = () => leader.get))
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val (sc, body) = call("GET", s"$base/groups")
      assert(sc == 200)
      assert(body.contains(""""group":"audit"""") &&
        body.contains(""""group":"etl""""), body)
      assert(body.contains(""""expiredTotal":0"""), body)
      assert("\"lastCommitMs\":(\\d+)".r.findAllMatchIn(body)
        .forall(_.group(1).toLong > 0L), body)
      // non-leader refuses the data-loss action
      leader.set(false)
      val (nc, nBody) = call("DELETE", s"$base/groups/etl")
      assert(nc == 400 && nBody.contains("not leader"))
      assert(FileTopicLog.groups(root) == Seq("audit", "etl"))
      // leader releases the pin; unknown group is a client error
      leader.set(true)
      val (dc, dBody) = call("DELETE", s"$base/groups/etl")
      assert(dc == 200 && dBody.contains(""""group":"etl""""))
      assert(FileTopicLog.groups(root) == Seq("audit"))
      assert(call("DELETE", s"$base/groups/etl")._1 == 400)
      // the expiry loop's lifetime counter surfaces in the view
      Thread.sleep(5)
      assert(expiry.expireOnce() == Seq("audit"))
      assert(call("GET", s"$base/groups")._2
        .contains(""""expiredTotal":1"""))
    } finally srv.stop()
  }

  test("group routes without a root configured answer an error, not a 500") {
    withServer { (base, _) =>
      val (sc, body) = call("GET", s"$base/groups")
      assert(sc == 400 && body.contains("no group root"))
      assert(call("DELETE", s"$base/groups/x")._1 == 400)
    }
  }
}
