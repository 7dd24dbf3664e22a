package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.changelog.{Changelog, ChangelogRecord, Op, RawRecord}

/** Synthesizes a Flink-style retraction changelog (`+I/-U/+U/-D`) from
  * Spark Structured Streaming output.
  *
  * Spark's `outputMode("update")` emits only the *new* value of changed
  * groups — there is no public update-before. The reference's consumers
  * remove retracted rows by value equality
  * (`/root/reference/lib/flink.py:27-45`), so the sink must remember the
  * previous row per group key and emit `(-U old, +U new)` pairs with the old
  * value bit-exact. `-U` immediately precedes its `+U` (pairs are emitted
  * adjacently), which the reference's flicker-suppression logic relies on
  * (`/root/reference/dashboard.py:90-91`).
  *
  * Scale note: state here is one row per *output group* (dashboard-sized,
  * e.g. 5 eye colors), not per input row — the heavy aggregation state lives
  * in Spark's StateStore on the executors. The sink only sees the per-batch
  * delta, so its cost is O(changed groups per micro-batch).
  */
final class ChangelogSynthesizer(schema: Seq[String], keyCols: Seq[String]) {
  private val keyIdx: Seq[Int] = keyCols.map(schema.indexOf)
  require(!keyIdx.contains(-1),
    s"key columns $keyCols not all present in schema $schema")

  private val state = mutable.LinkedHashMap.empty[Vector[Any], Vector[Any]]

  private def key(row: Vector[Any]): Vector[Any] = keyIdx.map(row).toVector

  /** One update-mode micro-batch: rows are the new values of changed keys. */
  def onUpsert(rows: Seq[Vector[Any]]): Seq[ChangelogRecord] =
    rows.flatMap { r =>
      state.put(key(r), r) match {
        case None => Seq(ChangelogRecord(Some(Op.Insert), r))
        case Some(old) if old == r => Seq.empty // no-op update: emit nothing
        case Some(old) => Seq(
          ChangelogRecord(Some(Op.UpdateBefore), old),
          ChangelogRecord(Some(Op.UpdateAfter), r))
      }
    }

  /** One complete-mode micro-batch: rows are the *entire* result. Diffs
    * against previous snapshot, so dropped groups emit `-D` (the case
    * update mode cannot express). */
  def onSnapshot(rows: Seq[Vector[Any]]): Seq[ChangelogRecord] = {
    val seen = mutable.Set.empty[Vector[Any]]
    val out = mutable.ArrayBuffer.empty[ChangelogRecord]
    rows.foreach { r =>
      val k = key(r)
      seen += k
      state.put(k, r) match {
        case None => out += ChangelogRecord(Some(Op.Insert), r)
        case Some(old) if old == r => ()
        case Some(old) =>
          out += ChangelogRecord(Some(Op.UpdateBefore), old)
          out += ChangelogRecord(Some(Op.UpdateAfter), r)
      }
    }
    state.keys.filterNot(seen).toVector.foreach { k =>
      out += ChangelogRecord(Some(Op.Delete), state.remove(k).get)
    }
    out.toSeq
  }
}

/** Attaches a changelog-synthesizing sink to a streaming DataFrame and
  * exposes the result as a [[graft.changelog.Changelog]] — the Spark
  * replacement for the reference's statement-results loop
  * (`/root/reference/api/statements.py:96-169` +
  * `/root/reference/lib/flink.py`): each micro-batch ≙ one result page;
  * an empty micro-batch enqueues a `None` heartbeat
  * (mirrors `/root/reference/api/statements.py:132-141`).
  */
object ChangelogStream {

  final class Handle(val query: StreamingQuery,
                     val schema: Seq[String],
                     queue: ConcurrentLinkedQueue[Option[RawRecord]]) {
    /** Fresh cursor over everything this sink has emitted so far. The
      * iterator is live: records enqueued after creation are still seen. */
    def changelog(): Changelog = new Changelog(schema, new Iterator[Option[RawRecord]] {
      override def hasNext: Boolean = !queue.isEmpty
      override def next(): Option[RawRecord] = queue.poll()
    })

    /** Process all currently-available input synchronously (test hook). */
    def processAllAvailable(): Unit = query.processAllAvailable()
    def stop(): Unit = query.stop()
  }

  /** Start an updating (grouped-aggregate) query with `-U/+U` synthesis.
    * `keyCols` are the grouping columns identifying a result row. */
  def updating(df: DataFrame, queryName: String, keyCols: Seq[String],
               trigger: Trigger = Trigger.ProcessingTime(0)): Handle = {
    val schema = df.schema.fieldNames.toSeq
    val synth = new ChangelogSynthesizer(schema, keyCols)
    val queue = new ConcurrentLinkedQueue[Option[RawRecord]]()
    val query = df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().iterator.map(r => r.toSeq.toVector).toSeq
        val recs = synth.synchronized(synth.onUpsert(rows))
        if (recs.isEmpty) queue.add(None)
        else recs.foreach(r =>
          queue.add(Some(RawRecord(r.op.map(_.code), r.values))))
        ()
      }
      .start()
    new Handle(query, schema, queue)
  }

  /** Start a complete-mode query with full-snapshot diffing: each batch
    * carries the entire result, and groups that leave it (e.g. crossing a
    * HAVING-style threshold) emit `-D` — the transition update mode cannot
    * express. Only for small (dashboard-sized) results: the snapshot is
    * O(result), though never O(input). */
  def snapshotting(df: DataFrame, queryName: String, keyCols: Seq[String],
                   trigger: Trigger = Trigger.ProcessingTime(0)): Handle = {
    val schema = df.schema.fieldNames.toSeq
    val synth = new ChangelogSynthesizer(schema, keyCols)
    val queue = new ConcurrentLinkedQueue[Option[RawRecord]]()
    val query = df.writeStream
      .outputMode("complete")
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().iterator.map(r => r.toSeq.toVector).toSeq
        val recs = synth.synchronized(synth.onSnapshot(rows))
        if (recs.isEmpty) queue.add(None)
        else recs.foreach(r =>
          queue.add(Some(RawRecord(r.op.map(_.code), r.values))))
        ()
      }
      .start()
    new Handle(query, schema, queue)
  }

  /** Start an append-only query (no aggregation): rows pass through as
    * `+I`, matching the reference's append wire form. */
  def appending(df: DataFrame, queryName: String,
                trigger: Trigger = Trigger.ProcessingTime(0)): Handle = {
    val schema = df.schema.fieldNames.toSeq
    val queue = new ConcurrentLinkedQueue[Option[RawRecord]]()
    val query = df.writeStream
      .outputMode("append")
      .queryName(queryName)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        if (rows.isEmpty) queue.add(None)
        else rows.foreach(r =>
          queue.add(Some(RawRecord(Some(Op.Insert.code), r.toSeq.toVector))))
        ()
      }
      .start()
    new Handle(query, schema, queue)
  }
}
