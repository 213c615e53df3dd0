package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped checkpoint cache for shared plan artifacts (the capped
  * shingle index, vocab counts, dedup labels, the graph projection):
  * local checkpoints have no public release, so every shared artifact is
  * checkpointed at most once per (session, sfDir, key) and reused across
  * queries and bench passes instead of accumulating a copy per consumer.
  * At 100 TB the same artifacts would persist to durable storage per
  * corpus snapshot — same shape, durable medium.
  *
  * The plan thunk is evaluated OUTSIDE any other cache entry's
  * computeIfAbsent (callers chain artifacts sequentially) — nesting
  * computeIfAbsent on one ConcurrentHashMap risks deadlock.
  */
private[graft] object SessionCache {
  private val m = new ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def checkpoint(key: String, s: SparkSession, d: String)(
      plan: => DataFrame): DataFrame =
    m.computeIfAbsent((s, d, key), _ => plan.localCheckpoint())
}
