package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Space-saving top-k heavy-hitters sketch as a typed
  * `Aggregator[String, Buffer, Seq[(item, count)]]` — the custom-
  * aggregation tier of SURVEY.md §7.4 ("partition-local sketches +
  * merge"). Each partition keeps at most `capacity` counters; merges sum
  * counters and re-truncate. Counts are exact whenever distinct items ≤
  * capacity (the spec's regime) and approximate with the classic
  * space-saving overestimate bound otherwise.
  *
  * Use for frequent tokens/shingles/hosts over 100 TB corpora: the
  * buffer is O(capacity) per partition regardless of input size, and the
  * merge tree is handled by Spark's partial aggregation.
  */
final case class TopKBuffer(counts: Map[String, Long])

class TopKAggregator(k: Int, capacity: Int)
    extends Aggregator[String, TopKBuffer, Seq[(String, Long)]] {

  override def zero: TopKBuffer = TopKBuffer(Map.empty)

  private def truncate(m: mutable.Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m.toMap
    else m.toSeq.sortBy { case (item, n) => (-n, item) }.take(capacity).toMap

  override def reduce(b: TopKBuffer, item: String): TopKBuffer = {
    val m = mutable.Map.from(b.counts)
    if (m.contains(item) || m.size < capacity) {
      m.update(item, m.getOrElse(item, 0L) + 1)
      TopKBuffer(m.toMap)
    } else {
      // space-saving: evict the minimum counter, inherit its count + 1
      val (minItem, minCount) = m.minBy { case (i, n) => (n, i) }
      m.remove(minItem)
      m.update(item, minCount + 1)
      TopKBuffer(m.toMap)
    }
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val m = mutable.Map.from(a.counts)
    b.counts.foreach { case (item, n) => m.update(item, m.getOrElse(item, 0L) + n) }
    TopKBuffer(truncate(m))
  }

  override def finish(r: TopKBuffer): Seq[(String, Long)] =
    r.counts.toSeq.sortBy { case (item, n) => (-n, item) }.take(k)

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
