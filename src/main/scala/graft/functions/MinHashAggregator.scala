package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` producing a MinHash signature from a group of
  * token hashes: sig[j] = min over tokens of (a_j·h + b_j) mod p.
  *
  * This is the UDAF rung of the custom-function ladder (SURVEY.md §2.I):
  * the relational formulation (cross join with a permutation table +
  * groupBy min, `TextOps.q26MinHashLsh`) is what the oracle verifies;
  * this aggregator computes the identical signature in one pass with a
  * k-element buffer — k·8 bytes of state per group instead of k
  * shuffled rows, the preferable shape when k is large or the token
  * stream is wide. Equality of the two formulations is pinned by
  * `MinHashAggregatorSpec`.
  */
class MinHashAggregator(perms: Array[(Long, Long)], p: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {

  override def zero: Array[Long] = Array.fill(perms.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < perms.length) {
      val (a, b) = perms(j)
      val v = (a * (h % p) + b) % p
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < x.length) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    implicitly[Encoder[Array[Long]]](Encoders.kryo[Array[Long]])

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
