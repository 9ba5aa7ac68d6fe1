package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-k `Aggregator` — the UDAF rung of the custom-function
  * ladder (builtin Column tree < typed Aggregator < native Catalyst
  * expression), and the SCALE-correct form of per-group top-k: the
  * window form (`row_number().over(partitionBy(g).orderBy(v)) <= k`)
  * shuffles EVERY row to its group's reducer and sorts there; this
  * aggregator keeps a k-bounded buffer per group per mapper, so only
  * `k × groups` rows per mapper reach the shuffle — at 100 TB that is
  * the difference between shuffling the table and shuffling a
  * summary. Spark plans it as ObjectHashAggregate with a partial
  * merge before the exchange.
  *
  * Entries are (value, id) longs; ordering is (value DESC, id ASC)
  * with the unique id as tiebreak, so results are deterministic and
  * oracle-comparable. k is expected small (top-10s, not top-millions):
  * the buffer insert is O(k) per row on a sorted vector.
  */
object TopKAgg {

  /** (value, id) input row for the aggregator. */
  final case class VI(v: Long, id: Long)

  private final class TopKLongs(k: Int)
      extends Aggregator[VI, Seq[(Long, Long)], Seq[(Long, Long)]] {

    // buffer invariant: sorted by (v DESC, id ASC), length ≤ k
    override def zero: Seq[(Long, Long)] = Vector.empty

    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(buf: Seq[(Long, Long)],
        e: (Long, Long)): Seq[(Long, Long)] = {
      if (buf.length >= k && !better(e, buf.last)) buf
      else {
        val i = buf.indexWhere(x => better(e, x)) match {
          case -1 => buf.length
          case n => n
        }
        val grown = (buf.take(i) :+ e) ++ buf.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }

    override def reduce(buf: Seq[(Long, Long)], in: VI): Seq[(Long, Long)] =
      insert(buf, (in.v, in.id))

    override def merge(a: Seq[(Long, Long)],
        b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      b.foldLeft(a)(insert)

    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Aggregate column: top `k` (value, id) pairs per group, sorted
    * (value DESC, id ASC). Apply as `topK(k)(valueCol, idCol)` (the
    * udaf flattens the VI encoder into two BIGINT parameters) —
    * returns `array<struct<_1: v, _2: id>>`. */
  def topK(k: Int): (Column, Column) => Column = {
    val enc: Encoder[VI] = Encoders.product[VI]
    val f = udaf(new TopKLongs(k), enc)
    (v: Column, id: Column) => f(v, id)
  }
}
