package graft.operators

/** S7: read-quota token bucket (noted as serving-side in SURVEY §2.4; kept
  * here because the batch engine still rate-limits repush/backfill reads).
  * Standard refill-on-demand bucket; thread-safe, no background thread. */
final class TokenBucket(capacity: Long, refillPerSec: Long,
    clockMs: () => Long = () => System.currentTimeMillis()) {
  private var tokens: Double = capacity.toDouble
  private var lastMs: Long = clockMs()

  def tryConsume(n: Long = 1): Boolean = synchronized {
    val now = clockMs()
    tokens = math.min(capacity.toDouble,
      tokens + (now - lastMs) / 1000.0 * refillPerSec)
    lastMs = now
    if (tokens >= n) { tokens -= n; true } else false
  }

  def available: Long = synchronized {
    val now = clockMs()
    tokens = math.min(capacity.toDouble,
      tokens + (now - lastMs) / 1000.0 * refillPerSec)
    lastMs = now
    tokens.toLong
  }
}
