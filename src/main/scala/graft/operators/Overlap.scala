package graft.operators

/** Overlap INDEPENDENT eager Spark work from the driver (guide §2.6:
  * "actions are only sequential because your driver code calls them
  * sequentially"). Several operators build multi-branch artifacts whose
  * branches are eager by construction — a calibration's candidate and
  * ground-truth tables, a sweep's per-threshold cluster closures — and
  * each branch is a chain of SMALL jobs (tiny shuffles, eager
  * checkpoints, model collects), so a serial driver loop pays
  * branches × (jobs × job-launch latency) wall-clock while most of the
  * cluster idles. Submitting the branches from a small thread pool lets
  * one branch's tasks back-fill the executors freed by another's tail;
  * Spark schedules concurrent jobs FIFO, which is exactly the back-fill
  * behaviour wanted. Results are positionally ordered, so callers
  * compose them exactly as the serial loop did — determinism is
  * unchanged (each branch's computation is self-contained; no branch
  * reads another's state).
  */
object Overlap {

  /** Run `thunks` concurrently (at most `maxConcurrent` in flight) and
    * return their results IN INPUT ORDER. The first failure is
    * rethrown (unwrapped) after all threads settle — loud, like the
    * serial loop. Threads are daemons; the pool dies with the call.
    */
  def build[A](thunks: Seq[() => A], maxConcurrent: Int = 4): Seq[A] = {
    require(maxConcurrent >= 1, s"maxConcurrent=$maxConcurrent")
    // DEADLOCK GUARD (r17 opt): Spark's analyzer resolves SQL table
    // functions while synchronized on the session's SessionCatalog, and
    // the graft_* TVFs build their results EAGERLY inside that window —
    // an overlapped build started there deadlocks (worker threads plan
    // their own queries and need the same monitor, while this thread
    // holds it and waits on their futures; observed as a SqlSurfaceSpec
    // hang via graft_ann → nswKnnLsh). When the calling thread holds
    // the active session's catalog monitor, run the serial loop — the
    // exact pre-overlap behavior, correct in every context.
    val underCatalogLock = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(s => Thread.holdsLock(s.sessionState.catalog))
    if (thunks.lengthCompare(1) <= 0 || underCatalogLock) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxConcurrent, thunks.size),
        (r: Runnable) => {
          val t = new Thread(r, "graft-overlap")
          t.setDaemon(true)
          t
        })
      try {
        import scala.jdk.CollectionConverters._
        val futures = thunks.map(f =>
          pool.submit(new java.util.concurrent.Callable[A] {
            override def call(): A = f()
          })).asJava
        futures.asScala.toSeq.map { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    }
  }
}
