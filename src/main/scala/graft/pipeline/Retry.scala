package graft.pipeline

/** Exponential-backoff retry — the reference's deadlock policy (T4,
  * snapshot_use_pyspark.py:298-340): up to `maxAttempts`, sleeping
  * `baseDelayMs * 2^attempt` between tries, retrying only errors the
  * predicate deems transient; anything else (or exhaustion) propagates so
  * Spark's task retry takes over (the reference leans on the same
  * escalation at T5).
  */
object Retry {

  def withBackoff[T](
      maxAttempts: Int = 5,
      baseDelayMs: Long = 500,
      isTransient: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable if isTransient(e) && attempt < maxAttempts - 1 =>
          sleep(baseDelayMs * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** MySQL transient errnos the reference retries: 1213 deadlock, 1205
    * lock-wait timeout (snapshot_use_pyspark.py:321-327).
    */
  def isMySqlTransient(e: Throwable): Boolean = {
    val msg = Option(e.getMessage).getOrElse("")
    e.isInstanceOf[java.sql.SQLTransientException] ||
      msg.contains("Deadlock") || msg.contains("deadlock") ||
      msg.contains("Lock wait timeout")
  }
}
