package graft.util

/** First-touch cost ledger for the engine's memoized fixtures (index
  * builds, streaming chunk feeds, commit chains). The min-of-passes
  * bench reports steady-state query times — correct for a long-lived
  * engine, but it makes one-time build cost INVISIBLE (r11 verdict: a
  * 2× regression in a build would never reach the headline number,
  * and 600× pass spreads polluted the noise block instead). So every
  * expensive ensure* records its build seconds here FROM INSIDE its
  * memo's computeIfAbsent lambda — memo hits never re-enter, so the
  * ledger holds exactly the first-touch costs — and Bench emits the
  * snapshot as the artifact's `builds` section, covered by the same
  * round-over-round comparison as the query times.
  */
object BuildCost {
  private val costs =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Time `body` and accumulate under `label` (staged fixtures — a
    * build plus later growth batches — sum into one number).
    */
  def record[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally costs.merge(label, (System.nanoTime() - t0) / 1e9,
      (a, b) => a + b)
  }

  def snapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    costs.asScala.toMap
  }

  def reset(): Unit = costs.clear()
}
