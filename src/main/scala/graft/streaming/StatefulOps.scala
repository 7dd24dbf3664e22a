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
