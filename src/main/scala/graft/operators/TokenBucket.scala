package graft.operators

/** S7: read-quota token bucket (noted as serving-side in SURVEY §2.4; kept
  * here because the batch engine still rate-limits repush/backfill reads).
  * Standard refill-on-demand bucket; thread-safe, no background thread. */
final class TokenBucket(capacity: Long, refillPerSec: Long,
    clockMs: () => Long = () => System.currentTimeMillis()) {
  // batch twin: TokenBucket.simulate replays admission over an event frame
  // (same refill-on-demand semantics, exact integer math)
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

object TokenBucket {

  /** Batch replay of token-bucket admission over an event frame — the
    * offline twin of the serving-side bucket (reference semantics:
    * `ReadQuotaEnforcementHandler`-style RCU gating, here replayed over a
    * historical request log to audit what WOULD have been throttled).
    *
    * Refill rate is expressed as 1 token per `refillIntervalMs`, and all
    * state is tracked in scaled integer units (1 unit = 1/refillIntervalMs
    * token), so the arithmetic is exact and bit-reproducible in any engine
    * (the DuckDB oracle replays it with a recursive CTE).
    *
    * Shape: ONE shuffle on the key, sort within partitions, single
    * streaming pass per partition — per-task memory is O(1), not
    * O(events-per-key), so a hot key cannot OOM a task at scale.
    *
    * @return (id, key, allowed, tokens_after) where tokens_after is in
    *         scaled units (divide by refillIntervalMs for whole tokens).
    */
  def simulate(events: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column, tsMs: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, capacityTokens: Long,
      refillIntervalMs: Long, costTokens: Long = 1L)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, raise_error, when}
    val spark = events.sparkSession
    import spark.implicits._
    val capS = capacityTokens * refillIntervalMs
    val costS = costTokens * refillIntervalMs
    // fail fast with a clear message: a NULL (or a string that casts to
    // NULL) in any replay column would otherwise surface as an opaque
    // "null value in non-nullable field" encoder error mid-job
    def req(c: org.apache.spark.sql.Column, name: String) =
      when(c.isNull, raise_error(lit(s"TokenBucket.simulate: $name is " +
        "null or not castable to long — the replay needs non-null " +
        "key/ts/id"))).otherwise(c)
    events.select(req(key.cast("long"), "key").as("key"),
        req(tsMs.cast("long"), "ts").as("ts"),
        req(id.cast("long"), "id").as("id"))
      .as[(Long, Long, Long)]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("id"))
      .mapPartitions { it =>
        var curKey = 0L; var tokens = 0L; var last = 0L; var started = false
        it.map { case (k, ts, rid) =>
          if (!started || k != curKey) {
            curKey = k; tokens = capS; last = ts; started = true
          } else {
            tokens = math.min(capS, tokens + (ts - last)); last = ts
          }
          val allowed = tokens >= costS
          if (allowed) tokens -= costS
          (rid, k, allowed, tokens)
        }
      }
      .toDF("id", "key", "allowed", "tokens_after")
  }
}
