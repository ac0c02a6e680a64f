package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * A file-backed topic log: a minimal Kafka-shaped broker surface on a
 * shared filesystem, used as the backing store for the in-flight
 * dynamic-assignment source ([[DynamicTopicLogProvider]]).
 *
 * Layout (mirrors a broker's log dirs — reference consumes exactly this
 * shape through `worker/ConsumerFetcherThread.java:92-154`):
 *
 * {{{
 *   <root>/_whitelist.json          controller-owned topic whitelist
 *   <root>/<topic>/p<P>.log         length-prefixed records, append-only
 *   <root>/<topic>/p<P>.idx         8 bytes/record: byte pos of record i
 *   <root>/<topic>/p<P>.count       committed record count (atomic swap)
 * }}}
 *
 * Why three files: `.log` holds the bytes, `.idx` makes seek-to-offset
 * O(1) (8-byte position per record — the same trick as Kafka's sparse
 * index, dense here because records are the unit), and `.count` is the
 * commit point — it is replaced via temp-file + ATOMIC_MOVE only AFTER
 * log+idx are flushed, so a reader that observes count=N can always read
 * N complete records. One writer per partition (Kafka's own contract);
 * any number of readers.
 *
 * Scale: readers seek, never scan-from-zero; the whitelist and counts are
 * O(#topic-partitions) metadata reads per micro-batch, and record bytes
 * flow executor-side through the DSv2 reader — nothing data-sized ever
 * crosses the driver.
 */
object FileTopicLog {

  /** One record as stored. `offset` is implicit in the file position on
    * write and materialized on read. */
  final case class LogRecord(
      key: Array[Byte],
      value: Array[Byte],
      tsMillis: Long,
      timestampType: Int = 0,
      headers: Seq[(String, Array[Byte])] = Nil)

  private def dir(root: String, topic: String): Path = Paths.get(root, topic)
  private def logFile(root: String, topic: String, p: Int): Path =
    dir(root, topic).resolve(s"p$p.log")
  private def idxFile(root: String, topic: String, p: Int): Path =
    dir(root, topic).resolve(s"p$p.idx")
  private def countFile(root: String, topic: String, p: Int): Path =
    dir(root, topic).resolve(s"p$p.count")

  /** Atomically replace `path` with `bytes` (temp file + ATOMIC_MOVE —
    * same idiom as [[graft.streaming.LeaseElection]] writes). */
  private def atomicWrite(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = path.resolveSibling(s"_${path.getFileName}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) out.writeInt(-1)
    else { out.writeInt(b.length); out.write(b) }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    if (n < 0) null
    else { val b = new Array[Byte](n); in.readFully(b); b }
  }

  /** Append records to one partition log. Single writer per partition.
    * Returns the new committed count. */
  def append(root: String, topic: String, partition: Int,
      records: IterableOnce[LogRecord]): Long = {
    val d = dir(root, topic)
    Files.createDirectories(d)
    val lf = logFile(root, topic, partition)
    val xf = idxFile(root, topic, partition)
    var pos = if (Files.exists(lf)) Files.size(lf) else 0L
    var n = committedCount(root, topic, partition)
    val log = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(lf.toFile, true), 1 << 16))
    val idx = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(xf.toFile, true), 1 << 14))
    try {
      // ByteArrayOutputStream per record would double-copy; count bytes
      // via the stream's written counter instead.
      records.iterator.foreach { r =>
        idx.writeLong(pos)
        val before = log.size()
        writeBytes(log, r.key)
        writeBytes(log, r.value)
        log.writeLong(r.tsMillis)
        log.writeInt(r.timestampType)
        log.writeInt(r.headers.size)
        r.headers.foreach { case (k, v) =>
          writeBytes(log, k.getBytes(StandardCharsets.UTF_8))
          writeBytes(log, v)
        }
        pos += (log.size() - before).toLong
        n += 1
      }
    } finally { log.close(); idx.close() }
    // commit point: only now do readers see the new records
    atomicWrite(countFile(root, topic, partition),
      n.toString.getBytes(StandardCharsets.UTF_8))
    n
  }

  /** Committed record count (0 when the partition does not exist). */
  def committedCount(root: String, topic: String, partition: Int): Long = {
    val cf = countFile(root, topic, partition)
    if (Files.exists(cf))
      new String(Files.readAllBytes(cf), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  /** Partition ids present for a topic (from `p<P>.count` files). */
  def partitionsOf(root: String, topic: String): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val d = dir(root, topic)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case PartCount(p) => p.toInt }
        .toSeq.sorted
      finally s.close()
    }
  }

  private val PartCount = "^p(\\d+)\\.count$".r

  /** Read records `[from, until)` of one partition — O(1) seek via the
    * index, then a single sequential scan of `until - from` records. */
  def read(root: String, topic: String, partition: Int,
      from: Long, until: Long): Iterator[(Long, LogRecord)] = {
    val n = math.min(until, committedCount(root, topic, partition))
    if (from >= n) return Iterator.empty
    val startPos = {
      val in = new DataInputStream(new FileInputStream(idxFile(root, topic, partition).toFile))
      try { in.skipNBytes(from * 8); in.readLong() } finally in.close()
    }
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new FileInputStream(logFile(root, topic, partition).toFile), 1 << 16))
    in.skipNBytes(startPos)
    var off = from
    new Iterator[(Long, LogRecord)] {
      private var closed = false
      def hasNext: Boolean = {
        val h = !closed && off < n
        if (!h && !closed) { closed = true; in.close() }
        h
      }
      def next(): (Long, LogRecord) = {
        val key = readBytes(in)
        val value = readBytes(in)
        val ts = in.readLong()
        val tsType = in.readInt()
        val nh = in.readInt()
        val hs = (0 until nh).map { _ =>
          val hk = new String(readBytes(in), StandardCharsets.UTF_8)
          val hv = readBytes(in)
          (hk, hv)
        }
        val r = (off, LogRecord(key, value, ts, tsType, hs))
        off += 1
        r
      }
    }
  }

  // ---- whitelist control file (the in-flight assignment channel) ----

  private def whitelistFile(root: String): Path =
    Paths.get(root, "_whitelist.json")

  /** Set the topic whitelist — the reference's F1/F2 add/delete surface
    * (`controller/rest/resources/TopicManagementRestletResource.java:113-252`).
    * Atomic replace; the running source observes it at its NEXT
    * micro-batch boundary, no restart. */
  def setWhitelist(root: String, topics: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(root))
    val json = topics.sorted.distinct
      .map(t => "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    atomicWrite(whitelistFile(root), json.getBytes(StandardCharsets.UTF_8))
  }

  /** Current whitelist (empty when unset). */
  def whitelist(root: String): Seq[String] = {
    val f = whitelistFile(root)
    if (!Files.exists(f)) Seq.empty
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.readTree(Files.readAllBytes(f))
      (0 until node.size()).map(node.get(_).asText())
    }
  }

  /** End offsets (committed counts) for every (whitelisted topic,
    * partition): the per-batch metadata read. */
  def endOffsets(root: String): Map[String, Map[Int, Long]] =
    whitelist(root).map { t =>
      t -> partitionsOf(root, t)
        .map(p => p -> committedCount(root, t, p)).toMap
    }.toMap

  // ---- rate control file (the runtime R1 channel) ----

  private def rateFile(root: String): Path = Paths.get(root, "_rate.json")

  /** Set (or clear) the max-rows-per-trigger cap on a RUNNING source —
    * the reference's `PUT /ratelimiter?messagerate=` surface
    * (`worker/RateLimiterResource.java:41-62`): the new rate applies
    * from the next micro-batch, no restart. */
  def setRate(root: String, maxRowsPerTrigger: Option[Long]): Unit = {
    Files.createDirectories(Paths.get(root))
    maxRowsPerTrigger match {
      case Some(n) =>
        require(n > 0, "rate must be positive")
        atomicWrite(rateFile(root),
          s"""{"maxRowsPerTrigger":$n}""".getBytes(StandardCharsets.UTF_8))
      case None =>
        Files.deleteIfExists(rateFile(root)): Unit
    }
  }

  /** Current runtime rate cap (None = unlimited / file absent). */
  def rate(root: String): Option[Long] = {
    val f = rateFile(root)
    if (!Files.exists(f)) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(f))
      Option(node.get("maxRowsPerTrigger")).map(_.asLong()).filter(_ > 0)
    }
  }
}
