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

  /** Schema-Registry wire format (the framing JR produces for the `user`
    * topic): 1 magic byte 0x00, then a 4-byte big-endian schema id, then
    * the Avro binary payload. This framing logic needs no connector jars,
    * so it IS unit-testable in this environment (UserStreamSpec) even
    * though the Kafka reader itself is not. */
  val WireMagic: Byte = 0x00
  val WireHeaderLen: Int = 5

  /** Schema id of a wire-format message (big-endian bytes 1–4). */
  def wireSchemaId(msg: Array[Byte]): Int = {
    require(msg.length >= WireHeaderLen && msg(0) == WireMagic,
      s"not Schema-Registry wire format: len=${msg.length}, " +
        s"magic=${if (msg.nonEmpty) msg(0) else "∅"}")
    ((msg(1) & 0xff) << 24) | ((msg(2) & 0xff) << 16) |
      ((msg(3) & 0xff) << 8) | (msg(4) & 0xff)
  }

  /** Drop the 5-byte header, returning the raw Avro payload — the JVM twin
    * of the Column-level strip used in [[kafka]]. */
  def stripWireHeader(msg: Array[Byte]): Array[Byte] = {
    wireSchemaId(msg) // validates magic + length
    java.util.Arrays.copyOfRange(msg, WireHeaderLen, msg.length)
  }

  /** Column-level header strip (1-based SQL substring: byte 6 onward). */
  def stripWireHeaderCol(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(value, WireHeaderLen + 1, Int.MaxValue)

  /** Decode the Avro *binary* encoding of the user record without the
    * spark-avro jar: Avro binary is field-ordered with no tags — strings
    * are a zigzag-varint byte length + UTF-8, ints are zigzag varints
    * (Avro spec §binary encoding). Used by UserStreamSpec to round-trip
    * crafted wire messages, keeping the kafka() path's decode contract
    * honest even though `from_avro` itself cannot load here. */
  def decodeAvroUser(payload: Array[Byte]): (String, String, Int, String) = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        b = payload(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1) // zigzag decode
    }
    def str(): String = {
      val len = varint().toInt
      val s = new String(payload, pos, len, "UTF-8"); pos += len; s
    }
    val guid = str(); val eyeColor = str()
    val age = varint().toInt
    val balance = str()
    require(pos == payload.length,
      s"trailing ${payload.length - pos} bytes after user record")
    (guid, eyeColor, age, balance)
  }

  /** Kafka + Avro wiring (requires spark-sql-kafka-0-10 and spark-avro on
    * the classpath; not present in this environment — the framing logic
    * above is the unit-tested subset). */
  def kafka(spark: SparkSession, bootstrap: String, topic: String = "user"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val payload = stripWireHeaderCol(col("value"))
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
