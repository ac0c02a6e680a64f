package graft.streaming

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import org.scalatest.funsuite.AnyFunSuite

/** Admin command surface — the reference's REST endpoints as manager
  * operations with JSON responses. */
class AdminApiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshManager(): PipelineManager = {
    val m = new PipelineManager(spark)
    m.update(PipelineSpec(name = "r1", route = Route("a", "b", 0),
      topics = Seq("click")))
    m
  }

  private def parses(json: String): Boolean =
    spark.read.json(Seq(json).toDS()).columns.nonEmpty

  test("addTopic whitelists and is idempotent-guarded") {
    val m = freshManager()
    val api = new AdminApi(m)
    assert(api.addTopic("r1", "view").contains("\"status\":\"ok\""))
    assert(m.spec("r1").get.topics == Seq("click", "view"))
    assert(api.addTopic("r1", "view").contains("error"))
    assert(api.addTopic("nope", "x").contains("error"))
  }

  test("updateIfCurrent refuses a stale snapshot (no lost updates)") {
    val m = freshManager()
    val snap = m.spec("r1").get
    // another command interleaves between our read and write
    m.update(snap.copy(topics = snap.topics :+ "added"))
    assert(!m.updateIfCurrent(snap, snap.copy(topics = Seq("click", "view"))))
    // the interleaved change survived
    assert(m.spec("r1").get.topics == Seq("click", "added"))
    // a fresh snapshot swaps fine
    val cur = m.spec("r1").get
    assert(m.updateIfCurrent(cur, cur.copy(topics = cur.topics :+ "view")))
    assert(m.spec("r1").get.topics == Seq("click", "added", "view"))
  }

  test("deleteTopic removes from whitelist and records the blacklist") {
    val m = freshManager()
    val api = new AdminApi(m)
    assert(api.deleteTopic("r1", "click").contains("ok"))
    val sp = m.spec("r1").get
    assert(sp.topics.isEmpty && sp.topicBlacklist == Set("click"))
    assert(api.deleteTopic("r1", "click").contains("error")) // already gone
  }

  test("blacklistPartition adds to the partition blacklist") {
    val m = freshManager()
    val api = new AdminApi(m)
    assert(api.blacklistPartition("r1", "click", 7).contains("ok"))
    assert(m.spec("r1").get.partitionBlacklist == Set(("click", 7)))
  }

  test("setRateLimit goes through admission control; absent -> error") {
    val ac = new AdmissionControl(100.0)
    val withAc = new AdminApi(freshManager(), Some(ac))
    assert(withAc.setRateLimit(250.0).contains("ok"))
    assert(ac.rowsPerSec == 250.0)
    assert(new AdminApi(freshManager()).setRateLimit(1.0).contains("error"))
  }

  test("every response is machine-parseable JSON") {
    val m = freshManager()
    val api = new AdminApi(m, Some(new AdmissionControl(1.0)))
    Seq(api.addTopic("r1", "v\"quoted\""), api.deleteTopic("r1", "click"),
      api.blacklistPartition("r1", "t", 1), api.setRateLimit(5.0),
      api.status, api.topics, api.addTopic("missing", "x"))
      .foreach(j => assert(parses(j), j))
  }
}
