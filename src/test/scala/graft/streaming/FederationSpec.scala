package graft.streaming

import graft.SparkTestSession
import graft.model.{PipelineSpec, Route}
import graft.sources.TopicCatalogObserver
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Federation integration: multiple routes under one PipelineManager with
 * the supervisor, auto-whitelister, and state backup all attached — the
 * shape of the reference's manager-level integration tests
 * (`WorkerInstanceTest.java:222-339` federated flow), minus Helix/ZK.
 */
class FederationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def records(topics: Seq[String], from: Int = 0, until: Int = 5): DataFrame =
    (for (t <- topics; p <- 0 to 1; o <- from until until)
      yield (s"k$o", s"v-$t-$p-$o", t, p, o.toLong))
      .toDF("k", "v", "topic", "partition", "offset")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"))

  test("two routes replicate independently; whitelister + backup operate across both") {
    val base = java.nio.file.Files.createTempDirectory("graft_fed_").toString
    val manager = new PipelineManager(spark)
    val supervisor = new RouteSupervisor(manager)
    spark.streams.addListener(supervisor)
    try {
      // two source "clusters", one topic each to start
      records(Seq("click", "view")).write.parquet(s"$base/src1")
      records(Seq("logs")).write.parquet(s"$base/src2")
      def starter(srcDir: String, outDir: String): PipelineSpec => org.apache.spark.sql.streaming.StreamingQuery =
        sp => {
          val schema = spark.read.parquet(srcDir).schema
          val src = ReplicationPipeline.fileSource(spark, srcDir, schema)
          ReplicationPipeline.parquetSink(
            ReplicationPipeline.transform(src, sp), outDir,
            sp.checkpointLocation.get).start()
        }
      val specA = PipelineSpec(name = "route-a", route = Route("c1", "dst", 0),
        topics = Seq("click"), excludeTopicRegex = None,
        checkpointLocation = Some(s"$base/ckptA"))
      val specB = PipelineSpec(name = "route-b", route = Route("c2", "dst", 1),
        topics = Seq("logs"), excludeTopicRegex = None,
        checkpointLocation = Some(s"$base/ckptB"))
      manager.start(specA)(starter(s"$base/src1", s"$base/outA"))
      manager.start(specB)(starter(s"$base/src2", s"$base/outB"))
      manager.awaitAll()
      assert(spark.read.parquet(s"$base/outA").count() == 10) // click only
      assert(spark.read.parquet(s"$base/outB").count() == 10) // logs

      // auto-whitelister: dst now also serves 'view' → route-a picks it up.
      // With a FILE source the widened whitelist applies to files not yet
      // committed to the checkpoint (a Kafka source would additionally
      // read the new topic's history via startingOffsets=earliest).
      val srcObs = TopicCatalogObserver.fromRecords(() =>
        spark.read.parquet(s"$base/src1"))
      val dstObs = new TopicCatalogObserver(() =>
        Seq(("click", 2), ("view", 2)).toDF("topic", "num_partitions"))
      val wl = new AutoWhitelister(manager, srcObs, dstObs, () => Set.empty)
      assert(wl.runOnce("route-a") == Seq("view"))
      manager.query("route-a").get.awaitTermination() // restarted by update
      assert(manager.spec("route-a").get.topics.sorted == Seq("click", "view"))
      // the ongoing stream delivers new records for both topics
      records(Seq("click", "view"), from = 5, until = 10)
        .coalesce(1).write.mode("append").parquet(s"$base/src1")
      manager.restart("route-a").get.awaitTermination()
      val outA = spark.read.parquet(s"$base/outA")
      assert(outA.count() == 30) // 10 old click + 20 new click+view
      assert(outA.filter(col("topic") === "view").count() == 10)

      // state backup sees both routes
      val dump = new StateBackupManager(manager, s"$base/backup").dump()
      val body = java.nio.file.Files.readString(dump)
      assert(body.contains("route-a") && body.contains("route-b"))
      assert(manager.running.sorted == Seq("route-a", "route-b"))
    } finally {
      spark.streams.removeListener(supervisor)
      manager.shutdown()
    }
  }

  test("two controllers, one backup dir: lease election gives exactly one writer, and failover moves it") {
    val base = java.nio.file.Files.createTempDirectory("graft_fo_").toString
    records(Seq("click")).write.parquet(s"$base/src")
    val view = Seq(("w1", "click", 0, "ONLINE")).toDF("instance", "topic",
      "partition", "state")
    def mkController(election: LeaseElection): GraftController =
      new GraftController(
        spark,
        srcObserver = TopicCatalogObserver.fromRecords(() =>
          spark.read.parquet(s"$base/src")),
        dstObserver = new TopicCatalogObserver(() =>
          Seq(("click", 2)).toDF("topic", "num_partitions")),
        idealView = () => view,
        externalView = () => view,
        backupDir = s"$base/backup", // SHARED — the exactly-one-writer dir
        isLeader = election.isLeader,
        fencingToken = election.fencingToken)
    val ea = new LeaseElection(s"$base/lease", "ctrl-a",
      ttlMs = 3000, renewPeriodMs = 300)
    val eb = new LeaseElection(s"$base/lease", "ctrl-b",
      ttlMs = 3000, renewPeriodMs = 300)
    val ca = mkController(ea)
    val cb = mkController(eb)
    def dumpCount(): Long = {
      val p = java.nio.file.Paths.get(s"$base/backup")
      if (!java.nio.file.Files.exists(p)) 0L
      else java.nio.file.Files.list(p)
        .filter(_.getFileName.toString.startsWith("state-")).count()
    }
    val deadline = System.currentTimeMillis() + 60000
    def until(what: String)(cond: => Boolean): Unit = {
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for: $what")
    }
    try {
      // a registers first and must win; b starts as follower
      assert(ea.tryAcquire())
      ea.start(); eb.start()
      ca.start(validationPeriodSeconds = 1, backupPeriodSeconds = 1)
      cb.start(validationPeriodSeconds = 1, backupPeriodSeconds = 1)
      until("a leads, b follows")(ea.isLeader() && !eb.isLeader())
      // leader writes backups; follower's loops run but export/write nothing
      until("leader dump")(dumpCount() >= 1)
      until("leader validates")(
        ca.validation.countersJson.contains(""""isLeader":true"""))
      assert(cb.validation.validateOnce()
        .contains(""""isLeader":false"""), "follower exported as leader")

      val tokA = ea.fencingToken()
      assert(tokA >= 0, "leader exposes no fencing token")
      assert(eb.fencingToken() == -1, "follower exposes a fencing token")

      // CRASH the leader: loops die, lease NOT released (abandon) — the
      // window before expiry must stay writer-free
      ca.stop(); ea.abandon()
      val atCrash = dumpCount()
      val leaseExpiry = ea.holder().map(_._2).getOrElse(0L)
      Thread.sleep(1200) // nominally inside the 3-s TTL
      // assert the no-early-steal window only while the TTL genuinely
      // has not elapsed — on a loaded machine the time since ctrl-a's
      // last renewal (controller stop + dump counting included) can
      // already exceed it, and a steal then is legitimate, not early.
      // SAMPLE the observables FIRST, read the clock AFTER: if the
      // post-sample clock is still inside the TTL, the samples were
      // provably taken inside it too — the check-then-sample order
      // would let a legitimate steal land between clock and sample on
      // a loaded box and flake the assert
      val stoleEarly = eb.isLeader()
      val dumpsInWindow = dumpCount()
      if (System.currentTimeMillis() < leaseExpiry - 100) {
        assert(!stoleEarly, "follower stole an unexpired lease")
        assert(dumpsInWindow == atCrash,
          "backups written while nobody held the lease")
      }

      // after the TTL the follower takes over and the writer moves
      until("failover")(eb.isLeader())
      until("new leader dumps")(dumpCount() > atCrash)
      until("new leader validates")(
        cb.validation.countersJson.contains(""""isLeader":true"""))
      assert(eb.holder().exists(_._1 == "ctrl-b"))
      // fencing moved with the lease: ctrl-b writes under a HIGHER
      // epoch, so even a late in-flight dump from deposed ctrl-a
      // (old epoch in the filename) could not clobber these files
      val tokB = eb.fencingToken()
      assert(tokB > tokA, s"fencing token did not advance: $tokA -> $tokB")
      until("fenced dump filename")(
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/backup"))
          .anyMatch(_.getFileName.toString.endsWith(s"-f$tokB.json")))
    } finally {
      cb.stop(); eb.stop(); ea.stop()
    }
  }
}
