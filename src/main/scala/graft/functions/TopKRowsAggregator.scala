package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k rows per group, generic in key and payload: keeps the k
  * FIRST rows by `Ordering[K]` (encode descending-ness in the ordering,
  * e.g. `Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])` for
  * value-DESC/id-ASC). Unlike `row_number() OVER (PARTITION BY g ORDER
  * BY v)` — which must shuffle and sort EVERY row of every group — this
  * aggregator's partial buffers are capped at k rows per group per map
  * task, so the shuffle carries at most k·|tasks| rows per group. The
  * window form is the right default; this is the 100 TB form when groups
  * are huge and k is small.
  *
  * Buffer trimming is amortized: inserts append until 4k, then truncate
  * to k; merge concatenates and truncates.
  */
class TopKRowsAggregator[K: Ordering: TypeTag, V: TypeTag](k: Int)
    extends Aggregator[(K, V), List[(K, V)], Seq[(K, V)]] {

  private def best(xs: List[(K, V)]): List[(K, V)] =
    xs.sortBy(_._1).take(k)

  override def zero: List[(K, V)] = Nil

  override def reduce(b: List[(K, V)], row: (K, V)): List[(K, V)] = {
    val appended = row :: b
    if (appended.length > 4 * k) best(appended) else appended
  }

  override def merge(a: List[(K, V)], b: List[(K, V)]): List[(K, V)] =
    best(a ++ b)

  override def finish(r: List[(K, V)]): Seq[(K, V)] = best(r)

  override def bufferEncoder: Encoder[List[(K, V)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(K, V)]] = ExpressionEncoder()
}
