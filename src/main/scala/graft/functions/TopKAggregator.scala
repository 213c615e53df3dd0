package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a one-pass Aggregator — the scale-correct
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY ...)
  * <= k` window idiom. The window form shuffles EVERY row of the corpus
  * to its group's partition and sorts the whole group before discarding
  * all but k rows; this aggregator keeps a k-element buffer per group,
  * combines map-side, and ships at most k rows per (partition, group)
  * through the shuffle — per-group `TakeOrderedAndProject`, which Spark
  * has for global top-k but not per-group.
  *
  * Ranking: value DESC, then id ASC — a strict total order whenever ids
  * are unique (they are: doc_id is the table key), so results are
  * deterministic and oracle-exact. Buffer cost is O(k) per group held in
  * an `ObjectHashAggregate`; with more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128)
  * groups per task it degrades to sort-based aggregation over the
  * GROUPS (still never sorting rows within a group) — fine here where
  * group count is small (languages/domains); raise the threshold for
  * high-cardinality grouping.
  */
class TopKLongPairs(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]]
    with Serializable {
  require(k > 0)

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)],
      x: (Long, Long)): Array[(Long, Long)] =
    if (buf.length >= k && !better(x, buf(buf.length - 1))) buf
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Array[(Long, Long)],
      b: Array[(Long, Long)]): Array[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    Encoders.kryo[Array[(Long, Long)]]

  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}
