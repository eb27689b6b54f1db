package graft

/** Shared metric-probe plumbing for the scaling studies. */
object TestMetrics {

  /** Wait until an async-listener-fed counter stops moving (the Spark
    * listener bus delivers task-end events after the job returns) and
    * return its settled value. One definition — five studies previously
    * each carried this loop.
    */
  def settle(read: () => Long, maxTries: Int = 50,
      intervalMs: Long = 100): Long = {
    var prev = -1L
    var cur = read()
    var tries = 0
    while (cur != prev && tries < maxTries) {
      Thread.sleep(intervalMs)
      prev = cur
      cur = read()
      tries += 1
    }
    cur
  }
}
