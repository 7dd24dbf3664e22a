package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming sources for the `user` dynamic table — the engine's stand-in
  * for the reference's Kafka topic (`/root/reference/README.md:108-112`,
  * Avro-generic + Schema Registry via JR).
  *
  * Three backends with one schema:
  *  - `memory`: MemoryStream-driven (tests; see ChangelogStreamSpec)
  *  - `file`: a parquet/json directory watched as an unbounded source —
  *    the offline twin used in this zero-egress environment
  *  - `kafka`: the production wiring. NOTE: this container ships neither
  *    spark-sql-kafka nor spark-avro jars, so `kafka()` documents and
  *    constructs the standard reader shape but cannot run here; on a real
  *    cluster add the two connector jars and it is the reference's exact
  *    pipeline (value → strip 5-byte Schema-Registry header → from_avro).
  */
object UserStream {

  /** The contractually-required user schema (FIXTURES.md §1). */
  val schema: StructType = StructType(Seq(
    StructField("guid", StringType),
    StructField("eyeColor", StringType),
    StructField("age", IntegerType),
    StructField("balance", StringType)))

  /** Avro schema for the same four fields (used by the kafka backend). */
  val avroSchema: String =
    """{"type":"record","name":"user","fields":[
      |{"name":"guid","type":"string"},
      |{"name":"eyeColor","type":"string"},
      |{"name":"age","type":"int"},
      |{"name":"balance","type":"string"}]}""".stripMargin

  /** Unbounded file source over a directory of user records (json or
    * parquet files dropped into `path` are consumed incrementally —
    * each new file ≙ a result page of the reference's polling loop). */
  def file(spark: SparkSession, path: String, format: String = "json"): DataFrame =
    spark.readStream
      .schema(schema)
      .format(format)
      .load(path)

  /** Kafka + Avro wiring (requires spark-sql-kafka-0-10 and spark-avro on
    * the classpath; not present in this environment). The substring(6)
    * drops the 1-byte magic + 4-byte schema-id Confluent wire-format
    * header before Avro decoding. */
  def kafka(spark: SparkSession, bootstrap: String, topic: String = "user"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val payload = expr("substring(value, 6, 2147483647)") // strip SR header
    raw.select(
      // from_avro lives in the spark-avro module; resolved reflectively so
      // this class links without the jar and fails only if actually used
      callAvroDecode(payload, avroSchema).as("user"))
      .select("user.guid", "user.eyeColor", "user.age", "user.balance")
  }

  private def callAvroDecode(value: org.apache.spark.sql.Column,
                             schema: String): org.apache.spark.sql.Column = {
    val cls = Class.forName("org.apache.spark.sql.avro.functions$")
    val module = cls.getField("MODULE$").get(null)
    cls.getMethod("from_avro", classOf[org.apache.spark.sql.Column],
        classOf[String])
      .invoke(module, value, schema)
      .asInstanceOf[org.apache.spark.sql.Column]
  }
}
