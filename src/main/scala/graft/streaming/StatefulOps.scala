package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming via `flatMapGroupsWithState`: the
  * streaming twin of the batch `EtlOps.gapMark` (validacion_C5).
  *
  * State per group = timestamp of the last MARKED event; an incoming
  * event is marked iff it is the group's first or more than `gapDays`
  * days newer than that state. Events are sorted within each
  * micro-batch; across batches the state carries forward, so the
  * semantics equal the batch operator when event time is
  * non-decreasing per key across batches (enforce upstream with a
  * watermark + ordered source, or run on replays where each key's
  * history lands in one batch).
  */
object StatefulOps {

  // public: Catalyst's generated encoders must reach the constructors
  case class GapEvent(k: String, tsMicros: Long, id: String)
  case class GapState(lastMarked: Long)

  /** events: (k: String group key, ts: timestamp, id: String) →
    * (id, flag 0/1). Works on a streaming OR batch Dataset. */
  def gapMarkStream(events: DataFrame, gapDays: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("k").cast("string").as("k"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"),
        col("id").cast("string").as("id"))
      .as[GapEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[GapEvent], state: GroupState[GapState]) =>
          var last = state.getOption.map(_.lastMarked)
          val out = it.toSeq.sortBy(e => (e.tsMicros, e.id)).map { e =>
            // SAME predicate as the batch operator (whole elapsed
            // days via integer division, strictly more than gapDays)
            // — a `ts - last > gapDays*day` form diverges on
            // fractional-day gaps
            val mark = last.forall(l =>
              (e.tsMicros - l) / 86400000000L > gapDays)
            if (mark) last = Some(e.tsMicros)
            (e.id, if (mark) 1 else 0)
          }
          last.foreach(l => state.update(GapState(l)))
          out.iterator
      }
      .toDF("id", "flag")
  }
}
