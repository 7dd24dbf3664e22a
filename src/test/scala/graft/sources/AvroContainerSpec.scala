package graft.sources

import java.io.File

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The `.avro` Object Container File source: real files written by the
  * Avro library itself (null + deflate codecs, small sync interval →
  * multiple blocks), read back distributed through AvroKeyInputFormat. */
class AvroContainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schemaJson =
    """{"type":"record","name":"user","fields":[
      |{"name":"guid","type":"string"},
      |{"name":"eyeColor","type":["null","string"],"default":null},
      |{"name":"age","type":"int"},
      |{"name":"balance","type":"string"},
      |{"name":"raw","type":"bytes"}]}""".stripMargin

  private def record(schema: Schema, i: Int): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("guid", f"guid-$i%04d")
    r.put("eyeColor", if (i % 7 == 0) null else Seq("brown", "blue", "green")(i % 3))
    r.put("age", 18 + i % 50)
    r.put("balance", f"$$${i * 13 % 9000}%d.${i % 100}%02d")
    r.put("raw", java.nio.ByteBuffer.wrap(Array((i % 256).toByte, (i / 256).toByte)))
    r
  }

  private def writeFile(dir: File, name: String, schema: Schema,
                        codec: CodecFactory, range: Range): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec)
    w.setSyncInterval(256) // tiny blocks: several sync markers per file
    w.create(schema, new File(dir, name))
    try range.foreach(i => w.append(record(schema, i)))
    finally w.close()
  }

  private lazy val dir: File = {
    val schema = new Schema.Parser().parse(schemaJson)
    val d = java.nio.file.Files.createTempDirectory("graft-avro").toFile
    writeFile(d, "part-0.avro", schema, CodecFactory.nullCodec(), 0 until 400)
    writeFile(d, "part-1.avro", schema, CodecFactory.deflateCodec(6), 400 until 1000)
    d
  }

  test("container files round-trip: schema mapped, all rows, both codecs") {
    val df = AvroContainer.read(spark, dir.getPath)
    val f = df.schema.fields.map(x => x.name -> ((x.dataType.simpleString, x.nullable))).toMap
    assert(f("guid") == (("string", false)))
    assert(f("eyeColor") == (("string", true)), "[null,string] union → nullable")
    assert(f("age") == (("int", false)))
    assert(f("raw") == (("binary", false)))
    val rows = df.collect()
    assert(rows.length == 1000)
    val byGuid = rows.map(r => r.getString(0) -> r).toMap
    (0 until 1000).foreach { i =>
      val r = byGuid(f"guid-$i%04d")
      assert(r.getInt(2) == 18 + i % 50, s"age of row $i")
      if (i % 7 == 0) assert(r.isNullAt(1), s"row $i null union leg")
      else assert(!r.isNullAt(1))
      assert(r.getAs[Array[Byte]](4).toSeq ==
        Seq((i % 256).toByte, (i / 256).toByte), s"bytes of row $i")
    }
  }

  test("reader schema projects over the writer schema (Avro resolution)") {
    val narrow =
      """{"type":"record","name":"user","fields":[
        |{"name":"guid","type":"string"},
        |{"name":"age","type":"int"}]}""".stripMargin
    val df = AvroContainer.read(spark, dir.getPath, narrow)
    assert(df.schema.fieldNames.toSeq == Seq("guid", "age"))
    assert(df.count() == 1000)
    // and it is real SQL input from here on
    df.createOrReplaceTempView("avro_users")
    val n = spark.sql(
      "SELECT count(*) FROM avro_users WHERE age BETWEEN 30 AND 40").head.getLong(0)
    val expected = (0 until 1000).count(i => { val a = 18 + i % 50; a >= 30 && a <= 40 })
    assert(n == expected)
  }

  test("splittable read: block splits yield more partitions than files") {
    // force tiny input splits: with 2 files, a sync-marker-splittable
    // format must fan out beyond one task per file
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = conf.get("mapreduce.input.fileinputformat.split.maxsize")
    conf.set("mapreduce.input.fileinputformat.split.maxsize", "4096")
    try {
      val df = AvroContainer.read(spark, dir.getPath)
      assert(df.rdd.getNumPartitions > 2,
        s"expected sub-file splits, got ${df.rdd.getNumPartitions} partitions")
      assert(df.count() == 1000, "splits must not duplicate or drop records")
    } finally {
      if (prev == null)
        conf.unset("mapreduce.input.fileinputformat.split.maxsize")
      else conf.set("mapreduce.input.fileinputformat.split.maxsize", prev)
    }
  }
}
