package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Child-JVM side of the cross-process partition-lock spec: performs ONE
  * slow `append` of `n` records (sleeping `sleepMs` between records, all
  * inside the partition lock) and drops a marker file the moment the
  * first record is being produced — i.e. the moment the lock is
  * provably held. The parent spec waits for the marker, then races an
  * `appendAt` from its own JVM: only the OS-level advisory lock can
  * serialize the two processes.
  *
  * Usage: `LockProbe <root> <topic> <partition> <n> <sleepMs> <marker>`
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val Array(root, topic, partition, n, sleepMs, marker) = args
    val records = new Iterator[FileTopicLog.LogRecord] {
      private var i = 0
      def hasNext: Boolean = i < n.toInt
      def next(): FileTopicLog.LogRecord = {
        if (i == 0) Files.write(Paths.get(marker), Array[Byte](1))
        else Thread.sleep(sleepMs.toLong)
        val r = FileTopicLog.LogRecord(
          s"k$i".getBytes(StandardCharsets.UTF_8),
          s"v$i".getBytes(StandardCharsets.UTF_8), 1700000000000L + i)
        i += 1
        r
      }
    }
    FileTopicLog.append(root, topic, partition.toInt, records)
  }
}
