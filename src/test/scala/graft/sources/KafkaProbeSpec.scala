package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Guarded probe for the one never-executed reference path: the Kafka
  * socket (`.format("kafka").load()`). The decode stack downstream of
  * `.load()` is fully spec'd (UserStreamSpec: SR header strip + Avro
  * binary, byte-for-byte vs the Avro library); the connector jar
  * (spark-sql-kafka-0-10) is absent from this image, so the probe
  * CANCELS cleanly today. The moment the jar appears on the classpath,
  * the guarded body runs: it resolves the kafka source through
  * [[UserStream.kafka]] and asserts the decoded schema — wiring proof
  * that needs no broker (source resolution and schema analysis happen at
  * `.load()`, before any connection is opened). */
class KafkaProbeSpec extends AnyFunSuite {

  private def kafkaOnClasspath: Boolean =
    try {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
        false, getClass.getClassLoader)
      true
    } catch { case _: ClassNotFoundException => false }

  test("kafka(): resolves the socket source and decodes to user rows " +
    "(auto-activates when spark-sql-kafka is on the classpath)") {
    assume(kafkaOnClasspath,
      "spark-sql-kafka-0-10 absent from this image — socket probe skipped " +
        "(decode path covered by UserStreamSpec)")
    val spark = SparkTestSession.spark
    // no broker needed: .load() resolves the provider and fixes the wire
    // schema; avroUserRows then declares the decoded shape on top
    val df = UserStream.kafka(spark, "localhost:1", "user")
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ==
      Seq("guid", "eyeColor", "age", "balance"))
  }

  test("kafka(): absence of the connector fails at source resolution, " +
    "not inside the decode stack") {
    assume(!kafkaOnClasspath, "connector present — the positive probe runs")
    val spark = SparkTestSession.spark
    val e = intercept[Exception] {
      UserStream.kafka(spark, "localhost:1", "user")
    }
    // the documented failure mode: missing DataSource, nothing from the
    // decode stages (those are connector-independent and spec'd green)
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
