package graft.streaming

import graft.SparkTestSession
import graft.sources.Records
import org.scalatest.funsuite.AnyFunSuite

/**
 * Embedded-Kafka end-to-end attempt, mirroring the reference's
 * in-process acceptance tests
 * (`uReplicator-Worker/src/test/java/.../WorkerInstanceTest.java:131-159,
 * 309-338`, broker boot in `KafkaStarterUtils.java:37-140`).
 *
 * OUTCOME IN THIS SANDBOX (documented per the round-2 review): the
 * build is offline with `/opt/spark/jars` as the only jar source, and
 * that distribution ships NEITHER `kafka-clients` NOR the
 * `spark-sql-kafka` connector NOR broker classes (verified:
 * `ls /opt/spark/jars | grep -i kafka` → only spark-streaming). An
 * embedded `KafkaServer`/`KafkaRaftServer` test is therefore
 * unobtainable here — no bytes can move through kafkaSource/kafkaSink
 * in this environment. These tests CANCEL (not pass) in that case so
 * the gap stays visible, and run for real on any classpath that
 * carries the jars.
 */
class KafkaE2eSpec extends AnyFunSuite {

  private def classPresent(name: String): Boolean =
    try { Class.forName(name); true } catch { case _: Throwable => false }

  private val connectorPresent =
    classPresent("org.apache.spark.sql.kafka010.KafkaSourceProvider")
  private val brokerPresent =
    classPresent("kafka.server.KafkaRaftServer") ||
      classPresent("kafka.server.KafkaServer")
  private val clientsPresent =
    classPresent("org.apache.kafka.clients.producer.KafkaProducer")

  test("classpath inventory is reported (connector / clients / broker)") {
    // always green: the classpath facts the other tests key off,
    // surfaced in the test log either way
    info(s"spark-sql-kafka connector present: $connectorPresent")
    info(s"kafka-clients present:             $clientsPresent")
    info(s"embeddable broker present:         $brokerPresent")
    assert(true)
  }

  test("kafkaStream binding resolves the Kafka source provider") {
    val spark = SparkTestSession.spark
    // Distinguish "provider missing" (cancel — environment gap) from
    // "provider present but unconfigured/unreachable" (the binding is
    // wired correctly; connection errors only surface on start()).
    try {
      val df = Records.kafkaStream(spark, "localhost:1", """{"t":[0]}""")
      // provider resolved and produced a streaming frame with the
      // canonical kafka schema
      assert(df.isStreaming)
      assert(df.columns.contains("value") && df.columns.contains("offset"))
    } catch {
      case e: Throwable =>
        val missing = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .exists(c => c.isInstanceOf[ClassNotFoundException] ||
            c.getMessage != null && c.getMessage.contains("Failed to find"))
        assume(!missing,
          "spark-sql-kafka connector absent from /opt/spark/jars (offline build)")
        throw e
    }
  }

  test("embedded broker round-trip: kafkaSource -> transform -> kafkaSink") {
    assume(connectorPresent && clientsPresent && brokerPresent,
      "kafka broker/client jars absent from /opt/spark/jars (offline build) — " +
        "no embedded-broker e2e is possible in this sandbox; the file-source " +
        "twin under the DuckDB gate (k2_replication_pipeline) covers the " +
        "transform semantics instead")
    // Reached only on a classpath that ships the broker. Mirrors
    // WorkerInstanceTest: produce N records to a source topic, run the
    // pipeline's transform through the kafka source/sink bindings,
    // assert count parity on the destination topic.
    fail("broker classes present but e2e harness not implemented for this " +
      "classpath — implement the boot mirroring KafkaStarterUtils.java:37-140")
  }
}
