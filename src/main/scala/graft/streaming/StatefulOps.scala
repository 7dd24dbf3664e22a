package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via flatMapGroupsWithState — the escape
  * hatch for semantics the built-in aggregates can't express (the Flink
  * runtime underlying the reference exposes the same power as keyed
  * process functions). Used here for a running per-key counter with
  * last-seen tracking; the shape generalizes to any per-key state machine.
  *
  * Scale: state lives in the executor StateStore partitioned by key —
  * the same sharding as a streaming aggregate; nothing accumulates on the
  * driver.
  */
object StatefulOps {

  case class KeyedCount(key: String, n: Long, lastValue: Double)

  case class KeyTopK(key: String, ids: Seq[Long], scores: Seq[Double])

  /** Streaming per-key top-k (the leaderboard op; streaming twin of the
    * batch q7 rank window and the v5 mergeable aggregate): keyed state is
    * the current k best (score, id) pairs — BOUNDED at k entries per key
    * no matter how long the stream runs, which is what makes this safe at
    * an unbounded 100 TB/day feed where a rank-window would need the full
    * history. Emits the refreshed top-k for every key that changed in the
    * batch (update mode). Ties break toward the lower id, so the emission
    * is deterministic for any arrival order once the same set of events
    * has been seen. */
  def topKPerKey[T](ds: Dataset[T], keyFn: T => String,
                    idFn: T => Long, scoreFn: T => Double,
                    k: Int): Dataset[KeyTopK] = {
    implicit val stateEnc: Encoder[KeyTopK] = Encoders.product[KeyTopK]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[KeyTopK, KeyTopK](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[T], state: GroupState[KeyTopK]) =>
          val cur = state.getOption.getOrElse(KeyTopK(key, Nil, Nil))
          val before = cur.scores.zip(cur.ids).toVector // (score, id)
          // fold the whole batch in ONE dedup+sort+truncate — top-k is
          // incrementally closed, so this equals the per-event fold at
          // O((B+k) log(B+k)) instead of O(B·k log k) on the hot loop.
          // distinct: an exactly-replayed event (at-least-once delivery)
          // must not occupy two slots; a redelivery with a RECOMPUTED
          // score is a different entry by design (scores are facts here,
          // not mutable attributes — id-level upsert would need a map)
          val top = (before ++ rows.map(r => (scoreFn(r), idFn(r))))
            .distinct
            .sortBy { case (s, id) => (-s, id) }
            .take(k)
            .toVector
          if (top != before) {
            val next = KeyTopK(key, top.map(_._2), top.map(_._1))
            state.update(next)
            Iterator.single(next)
          } else Iterator.empty
      }
  }

  /** Running count + last value per key, emitting an update per input
    * batch in which the key appeared. */
  def runningCounts[T](ds: Dataset[T], keyFn: T => String,
                       valueFn: T => Double): Dataset[KeyedCount] = {
    implicit val stateEnc: Encoder[KeyedCount] = Encoders.product[KeyedCount]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[KeyedCount, KeyedCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[T], state: GroupState[KeyedCount]) =>
          var cur = state.getOption.getOrElse(KeyedCount(key, 0L, 0.0))
          var any = false
          rows.foreach { r =>
            cur = KeyedCount(key, cur.n + 1, valueFn(r))
            any = true
          }
          if (any) {
            state.update(cur)
            Iterator.single(cur)
          } else Iterator.empty
      }
  }
}
