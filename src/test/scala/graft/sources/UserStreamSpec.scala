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
}
