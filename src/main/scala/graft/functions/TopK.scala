package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Top-k by score as a typed Aggregator.
  *
  * The window/row_number formulation of per-group top-k sorts every
  * group's full candidate list; this Aggregator keeps a bounded
  * buffer of k entries and — because Aggregators partial-aggregate —
  * does so map-side before the shuffle, so only k rows per group per
  * partition ever move. That is the difference between shuffling the
  * corpus and shuffling k·groups rows at 100 TB.
  *
  * Ordering: score desc, then id asc (stable, deterministic ties).
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Array[Scored], Array[Scored]] {

    override def zero: Array[Scored] = Array.empty

    override def reduce(buf: Array[Scored], s: Scored): Array[Scored] =
      insert(buf, s)

    override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] =
      b.foldLeft(a)(insert)

    override def finish(buf: Array[Scored]): Array[Scored] = buf

    private def insert(buf: Array[Scored], s: Scored): Array[Scored] =
      if (buf.length >= k && !lt(s, buf.last)) buf
      else {
        val idx = buf.indexWhere(e => lt(s, e)) match {
          case -1 => buf.length
          case i  => i
        }
        val out = (buf.take(idx) :+ s) ++ buf.drop(idx)
        if (out.length > k) out.take(k) else out
      }

    override def bufferEncoder: Encoder[Array[Scored]] = Encoders.kryo
    override def outputEncoder: Encoder[Array[Scored]] = Encoders.kryo
  }
}
