package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.FileTopicLog

/** Driver-side metadata-walk scale curve for the dynamic topic-log
  * source: [[FileTopicLog.endOffsets]] runs once per micro-batch and
  * reads every whitelisted (topic, partition)'s committed state — the
  * reference plans routes over THOUSANDS of TPs
  * (`uReplicator-Controller/.../OffsetMonitor.java:240-316`), so this
  * walk is the one driver-side cost that grows with assignment size,
  * not data size. Measures ms/walk at 20 / 100 / 1000 TPs, three ways:
  *
  *  - `uncached`: the pre-round-12 shape — open+read+parse JSON per TP
  *    every walk (reimplemented here verbatim as the baseline);
  *  - `steady`: [[FileTopicLog.endOffsets]] with the stat-validated
  *    state cache, no commits between walks (the common planning loop:
  *    most TPs idle per trigger);
  *  - `dirty`: one TP receives a commit between walks (cache must
  *    revalidate everything and re-parse the changed one).
  *
  * Prints one JSON line. No SparkSession — this is pure driver-side
  * filesystem metadata, measured as such.
  */
object TopicScaleBench {

  private def rec(i: Int): FileTopicLog.LogRecord =
    FileTopicLog.LogRecord(
      s"k$i".getBytes(StandardCharsets.UTF_8),
      s"v$i".getBytes(StandardCharsets.UTF_8), 1700000000000L + i)

  /** The pre-cache walk, reimplemented self-contained (no FileTopicLog
    * caches anywhere in the path): whitelist JSON parse + directory
    * listing per topic + read+parse per partition — exactly what
    * endOffsets cost before the stamp caches. */
  private def uncachedWalk(root: String): Long = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val wlf = java.nio.file.Paths.get(root, "_whitelist.json")
    val wl = om.readTree(Files.readAllBytes(wlf))
    val partRe = "^p(\\d+)\\.count$".r
    (0 until wl.size()).map(wl.get(_).asText()).map { t =>
      val d = java.nio.file.Paths.get(root, t)
      val parts = {
        val s = Files.list(d)
        try s.iterator().asScala.map(_.getFileName.toString)
          .collect { case partRe(p) => p.toInt }.toSeq.sorted
        finally s.close()
      }
      parts.map { p =>
        val cf = d.resolve(s"p$p.count")
        if (!Files.exists(cf)) 0L
        else {
          val s = new String(Files.readAllBytes(cf), StandardCharsets.UTF_8).trim
          if (s.startsWith("{")) om.readTree(s).get("end").asLong() else s.toLong
        }
      }.sum
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val parts = 4
    val sizes = Seq(5, 25, 250) // topics -> 20 / 100 / 1000 TPs
    val iters = args.headOption.map(_.toInt).getOrElse(40)
    val out = sizes.map { nTopics =>
      val root = graft.SessionTemp.dir(s"graft_tpscale_$nTopics")
      val topics = (0 until nTopics).map(i => f"topic$i%04d")
      topics.foreach { t =>
        (0 until parts).foreach(p => FileTopicLog.append(root, t, p, Seq(rec(p))))
      }
      FileTopicLog.setWhitelist(root, topics)
      def time(f: => Unit): Double = {
        f; f // warm
        val t0 = System.nanoTime()
        (0 until iters).foreach(_ => f)
        (System.nanoTime() - t0) / 1e6 / iters
      }
      val uncached = time { uncachedWalk(root): Unit }
      val steady = time { FileTopicLog.endOffsets(root): Unit }
      var bump = 100
      val dirty = time {
        FileTopicLog.append(root, topics.head, 0, Seq(rec(bump))); bump += 1
        FileTopicLog.endOffsets(root): Unit
      }
      // continuous ingest on EVERY topic — each append bumps its dir
      // mtime, so the racy-stamp rule keeps the listing cache cold and
      // the exact walk re-lists every dir every trigger. The paired TTL
      // walk (the source's listingTtlMs) reuses recent listings. The
      // appends run BETWEEN iterations, outside the timed region: only
      // the walk itself is measured.
      def timeHotWalk(walk: => Unit): Double = {
        var ns = 0L
        (0 until iters).foreach { _ =>
          topics.foreach(t => FileTopicLog.append(root, t, 0, Seq(rec(bump))))
          bump += 1
          val t0 = System.nanoTime()
          walk
          ns += System.nanoTime() - t0
        }
        ns / 1e6 / iters
      }
      val hotExact = timeHotWalk { FileTopicLog.endOffsets(root): Unit }
      val hotTtl = timeHotWalk {
        FileTopicLog.endOffsets(root, listingStalenessMs = 60000L): Unit
      }
      // the walk must SEE the commits the dirty loop made (cache coherence
      // under measurement, not just speed)
      val end = FileTopicLog.endOffsets(root)
      require(end(topics.head)(0) > 1L, "dirty commits must be visible")
      require(end.size == nTopics && end.forall(_._2.size == parts))
      // retention-cut cost of one truncating commit over EVERY assigned
      // partition, with 3 registered consumer groups: the snapshot form
      // (one _groups read per commit — what commit() does since r13) vs
      // naive per-partition re-reads (the per-call overload's shape)
      Seq("g1", "g2", "g3").foreach { g =>
        FileTopicLog.registerGroup(root, g)
        FileTopicLog.commitGroup(root, g,
          topics.map(t => t -> (0 until parts).map(p => p -> 1L).toMap).toMap)
      }
      val cutSnap = time {
        val snap = FileTopicLog.groupSnapshot(root)
        topics.foreach(t => (0 until parts).foreach(p =>
          FileTopicLog.retentionCut(snap, root, t, p, 1L): Unit))
      }
      val cutPer = time {
        topics.foreach(t => (0 until parts).foreach(p =>
          FileTopicLog.retentionCut(root, t, p, 1L): Unit))
      }
      (nTopics * parts,
        f""""tps_${nTopics * parts}":{"uncached_ms":$uncached%.3f,"steady_ms":$steady%.3f,"dirty1_ms":$dirty%.3f,"allhot_exact_ms":$hotExact%.3f,"allhot_ttl_ms":$hotTtl%.3f,"cut_snapshot_ms":$cutSnap%.3f,"cut_perpart_ms":$cutPer%.3f}""")
    }
    val ratio = {
      val walks = out.map(_._1)
      f""""tp_ratio":${walks.last.toDouble / walks.head}%.0f"""
    }
    println(s"""{"metric":"topiclog_metadata_walk","unit":"ms_per_walk",$ratio,${out.map(_._2).mkString(",")},"iters":$iters}""")
    if (args.contains("--stream")) streamDrain()
  }

  /** End-to-end check that a reference-scale assignment (1000 TPs in one
    * whitelist) flows through the ACTUAL streaming source, not just the
    * metadata walk: 250 topics x 4 partitions x 20 records drained by a
    * real query, once unbounded (1 batch) and once rate-capped to force
    * ~10 planning walks. Wall seconds per drain, plus a row-count
    * assert so a planning bug cannot read as a speedup. */
  private def streamDrain(): Unit = {
    val nTopics = 250; val parts = 4; val per = 20
    val root = graft.SessionTemp.dir("graft_tpstream_")
    val topics = (0 until nTopics).map(i => f"topic$i%04d")
    topics.foreach { t =>
      (0 until parts).foreach(p =>
        FileTopicLog.append(root, t, p, (0 until per).map(rec)))
    }
    FileTopicLog.setWhitelist(root, topics)
    val spark = Sessions.local("graft-tpstream",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val want = nTopics.toLong * parts * per
    def drain(maxRows: Option[Long]): Double = {
      val base = graft.SessionTemp.dir("graft_tpstream_q_")
      val r = spark.readStream.format("graft-topiclog").option("path", root)
      val src = maxRows.fold(r)(n => r.option("maxRowsPerTrigger", n.toString))
      val t0 = System.nanoTime()
      val q = src.load().selectExpr("topic", "partition", "offset")
        .writeStream.format("parquet")
        .option("path", s"$base/sink")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val got = spark.read.parquet(s"$base/sink").count()
      require(got == want, s"drained $got of $want rows")
      secs
    }
    val oneBatch = drain(None)
    val tenBatch = drain(Some(want / 10))
    println(f"""{"metric":"topiclog_stream_drain_1000tp","unit":"sec","rows":$want,"one_batch":$oneBatch%.2f,"ten_batches":$tenBatch%.2f}""")
    spark.stop()
  }
}
