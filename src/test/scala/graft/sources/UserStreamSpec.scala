package graft.sources

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Kafka path's environment-independent subset: Confluent
  * Schema-Registry wire framing (magic 0x00 + big-endian schema id +
  * Avro binary payload) and the Avro binary record encoding — exercised
  * against hand-crafted byte buffers, since the connector jars that would
  * run the full reader are absent from this image. */
class UserStreamSpec extends AnyFunSuite {

  /** Test-side Avro binary encoder for the user record (Avro spec §binary
    * encoding: zigzag varints, length-prefixed UTF-8 strings, fields in
    * schema order, no tags). */
  private def encodeAvroUser(guid: String, eyeColor: String, age: Int,
                             balance: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63) // zigzag
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); varint(b.length); out.write(b)
    }
    str(guid); str(eyeColor); varint(age); str(balance)
    out.toByteArray
  }

  private def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    Array[Byte](UserStream.WireMagic,
      (schemaId >>> 24).toByte, (schemaId >>> 16).toByte,
      (schemaId >>> 8).toByte, schemaId.toByte) ++ payload

  test("wire header: schema id is read big-endian; strip returns the payload") {
    val payload = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    val msg = frame(0x01020304, payload)
    assert(UserStream.wireSchemaId(msg) == 0x01020304)
    assert(UserStream.stripWireHeader(msg).toSeq == payload.toSeq)
    // empty payload is legal framing
    assert(UserStream.stripWireHeader(frame(7, Array.empty)).isEmpty)
  }

  test("wire header: wrong magic and truncated buffers are rejected") {
    val bad = frame(1, Array[Byte](9)); bad(0) = 0x13
    intercept[IllegalArgumentException](UserStream.stripWireHeader(bad))
    intercept[IllegalArgumentException](
      UserStream.stripWireHeader(Array[Byte](0, 0, 0)))
    intercept[IllegalArgumentException](
      UserStream.stripWireHeader(Array.empty[Byte]))
  }

  test("avro binary user record round-trips, incl. multi-byte varints and UTF-8") {
    val cases = Seq(
      ("u-1", "brown", 41, "$1,234.56"),
      ("", "blüe", 0, ""),               // empty strings, non-ASCII
      ("g" * 200, "amber", 127, "$0.01"),// length needs a 2-byte varint
      ("x", "green", -3, "$9.99"))       // negative int zigzags correctly
    cases.foreach { case (g, e, a, b) =>
      val enc = encodeAvroUser(g, e, a, b)
      assert(UserStream.decodeAvroUser(enc) == ((g, e, a, b)), s"case $g/$e/$a/$b")
    }
    // trailing garbage is an error, not silently ignored
    intercept[IllegalArgumentException](
      UserStream.decodeAvroUser(encodeAvroUser("a", "b", 1, "c") ++ Array[Byte](0)))
  }

  test("full wire message: frame → column-level strip → avro decode") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val users = Seq(("u1", "brown", 41, "$10.00"), ("u2", "blue", 25, "$2.50"))
    val msgs = users.map { case (g, e, a, b) =>
      frame(42, encodeAvroUser(g, e, a, b))
    }
    // the SAME Column expression kafka() applies to the Kafka value column
    val stripped = msgs.toDF("value")
      .select(UserStream.stripWireHeaderCol($"value").as("payload"))
      .collect().map(_.getAs[Array[Byte]](0))
    // SQL-side strip must agree byte-for-byte with the JVM-side strip
    stripped.zip(msgs).foreach { case (sql, msg) =>
      assert(sql.toSeq == UserStream.stripWireHeader(msg).toSeq)
    }
    assert(stripped.map(UserStream.decodeAvroUser).toSeq == users)
  }

  /** Encode with the REAL Avro library (GenericDatumWriter) — the same
    * code path JR/Kafka producers use — so the decode tests below run
    * against library-authored bytes, not just our hand encoder. */
  private def encodeAvroUserLib(guid: String, eyeColor: String, age: Int,
                                balance: String): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(UserStream.avroSchema)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("guid", guid); rec.put("eyeColor", eyeColor)
    rec.put("age", age); rec.put("balance", balance)
    val out = new ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("hand-rolled encoder/decoder agree with the Apache Avro library bit-for-bit") {
    val cases = Seq(("u-1", "brown", 41, "$1,234.56"), ("", "blüe", 0, ""),
      ("g" * 200, "amber", 127, "$0.01"), ("x", "green", -3, "$9.99"))
    cases.foreach { case (g, e, a, b) =>
      val lib = encodeAvroUserLib(g, e, a, b)
      assert(lib.toSeq == encodeAvroUser(g, e, a, b).toSeq,
        s"encoding mismatch for $g/$e/$a/$b")
      assert(UserStream.decodeAvroUser(lib) == ((g, e, a, b)))
    }
  }

  test("avroUserRows: library-grade decode runs as a streaming source end to end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val users = (1 to 30).map(i =>
      (s"guid-$i", Seq("brown", "blue", "green")(i % 3), 20 + i % 50, s"$$$i.00"))
    val msgs = users.map { case (g, e, a, b) =>
      frame(42, encodeAvroUserLib(g, e, a, b))
    }
    // batch: decoded rows equal the library-encoded inputs
    val batch = UserStream.avroUserRows(msgs.toDF("value"))
      .as[(String, String, Int, String)].collect().toSeq
    assert(batch.sortBy(_._1) == users.sortBy(_._1))

    // streaming: the same decode over a MemoryStream, aggregated demo2-
    // style, equals the batch answer — the reference's topic->agg path
    // with the Kafka socket as the only absent piece
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[Array[Byte]]
    val q = UserStream.avroUserRows(mem.toDF())
      .groupBy($"eyeColor").count()
      .writeStream.format("memory").queryName("avro_users_agg")
      .outputMode("complete").start()
    try {
      mem.addData(msgs: _*)
      q.processAllAvailable()
      val streamed = spark.table("avro_users_agg")
        .as[(String, Long)].collect().toMap
      val expected = users.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(streamed == expected, s"$streamed != $expected")
    } finally q.stop()
  }
}
