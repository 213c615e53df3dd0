package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary (Misra & Gries 1982), with the
  * mergeable-summaries combine step of Agarwal et al. (PODS'12): a
  * capacity-k map of candidate → residual count.
  *
  * Guarantee: after ANY order of reduce/merge, every item whose true
  * frequency exceeds n/(k+1) of the n-item stream is present in the
  * summary (each decrement step removes k+1 occurrences of distinct
  * items, so an item can lose at most n/(k+1) total count). The summary
  * is therefore a sound CANDIDATE set for exact heavy-hitters: a second
  * exact count over just the candidates removes false positives — the
  * two-pass shape q92 registers, which never shuffles the full token
  * universe (the sketch is one map-side object-hash aggregate; the
  * exact pass is a broadcast semi-join + hash agg).
  *
  * Scale: the buffer is O(k) per partial regardless of stream length or
  * distinct-item count — the property that makes frequent-items viable
  * on a 100 TB token stream where a full groupBy(token) would shuffle
  * billions of distinct keys to find a few dozen hitters.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]]
    with Serializable {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        // decrement-all: cancels one occurrence of x against one of each
        // resident candidate; zeros drop out
        m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  /** Agarwal et al. merge: sum counts, then if over capacity subtract
    * the (k+1)-th largest count from every entry and drop non-positive
    * residuals — the multi-item analogue of decrement-all, preserving
    * the n/(k+1) deficit bound. */
  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse).apply(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sortInPlace().array

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
