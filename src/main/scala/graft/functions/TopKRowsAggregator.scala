package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k rows per group: keeps the k largest (value, id, payload)
  * rows, ordered by value DESC with id ASC tie-break. Unlike
  * `row_number() OVER (PARTITION BY g ORDER BY v)` — which must shuffle
  * and sort EVERY row of every group — this aggregator's partial buffers
  * are capped at k rows per group per map task, so the shuffle carries
  * at most k·|tasks| rows per group. The window form is the right
  * default; this is the 100 TB form when groups are huge and k is small.
  *
  * Buffer trimming is amortized: inserts append until 4k, then truncate
  * to k; merge concatenates and truncates.
  */
class TopKRowsAggregator(k: Int)
    extends Aggregator[(Double, Long, String), List[(Double, Long, String)], Seq[(Double, Long, String)]] {

  private def best(xs: List[(Double, Long, String)]): List[(Double, Long, String)] =
    xs.sortBy { case (v, id, _) => (-v, id) }.take(k)

  override def zero: List[(Double, Long, String)] = Nil

  override def reduce(
      b: List[(Double, Long, String)],
      row: (Double, Long, String)): List[(Double, Long, String)] = {
    val appended = row :: b
    if (appended.length > 4 * k) best(appended) else appended
  }

  override def merge(
      a: List[(Double, Long, String)],
      b: List[(Double, Long, String)]): List[(Double, Long, String)] =
    best(a ++ b)

  override def finish(r: List[(Double, Long, String)]): Seq[(Double, Long, String)] =
    best(r)

  override def bufferEncoder: Encoder[List[(Double, Long, String)]] =
    ExpressionEncoder[List[(Double, Long, String)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, String)]] =
    ExpressionEncoder[Seq[(Double, Long, String)]]()
}
