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
  * Artifacts CHAIN (the pairs thunk builds the shingle index, which has
  * its own cache entry), so lookup must be REENTRANT:
  * `computeIfAbsent` is not — a nested call that hashes into the bin
  * under computation throws `IllegalStateException: Recursive update`
  * (bin collisions made this a full-suite-only flake). get/putIfAbsent
  * tolerates reentrancy; the benign race (two concurrent first-builds
  * of one key) cannot happen in the sequential query drivers and would
  * only cost a duplicate checkpoint if it did.
  */
private[graft] object SessionCache {
  private val m = new ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def checkpoint(key: String, s: SparkSession, d: String)(
      plan: => DataFrame): DataFrame = {
    val k = (s, d, key)
    val existing = m.get(k)
    if (existing != null) existing
    else {
      val built = plan.localCheckpoint() // may reentrantly call checkpoint
      val prev = m.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }
}
