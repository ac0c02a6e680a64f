package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.DataFrame

/**
 * R1 — runtime-adjustable rate limiting.
 *
 * The reference throttles the fetch loop with a Guava RateLimiter whose
 * rate can be changed on a RUNNING route via REST
 * (`worker/FetcherManager.java:101-123`,
 * `worker/RateLimiterResource.java:41-62`). Spark's static analog is
 * `maxOffsetsPerTrigger` (fixed at query start); this class is the
 * dynamic half: admission control inside `foreachBatch`, pacing each
 * micro-batch to the *current* rate. Changing the rate takes effect on
 * the next batch with no query restart — so no checkpoint churn.
 *
 * Throttling never drops records (the batch's offsets are already
 * committed to the epoch); it stretches wall time, which backpressures
 * the source exactly like the reference's acquire-before-enqueue.
 */
final class AdmissionControl(initialRowsPerSec: Double) {

  private val rateBits =
    new AtomicLong(java.lang.Double.doubleToLongBits(initialRowsPerSec))
  @volatile private var lastPauseMillisVar = 0L

  def rowsPerSec: Double = java.lang.Double.longBitsToDouble(rateBits.get())

  /** Runtime rate change (reference `PUT /ratelimiter?messagerate=`). */
  def set(rowsPerSec: Double): Unit = {
    require(rowsPerSec > 0, "rate must be positive")
    rateBits.set(java.lang.Double.doubleToLongBits(rowsPerSec))
  }

  /** Pause applied after the most recent batch (observability + tests). */
  def lastPauseMillis: Long = lastPauseMillisVar

  /** Wrap a foreachBatch body with pacing: write the batch, then sleep
    * whatever remains of `rows / rowsPerSec`. The batch is pinned with
    * persist so the count doesn't recompute the lineage for the write. */
  def paced(write: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (df, batchId) => {
      val t0 = System.nanoTime()
      val pinned = df.persist()
      try {
        val rows = pinned.count()
        write(pinned, batchId)
        val elapsedSec = (System.nanoTime() - t0) / 1e9
        val targetSec = rows / rowsPerSec
        val pause = math.max(0L, math.round((targetSec - elapsedSec) * 1000))
        lastPauseMillisVar = pause
        if (pause > 0) Thread.sleep(pause)
      } finally pinned.unpersist()
    }
}
