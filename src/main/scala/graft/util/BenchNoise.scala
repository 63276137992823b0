package graft.util

/** Cross-RUN inflation detector (r13 verdict task 6). The in-run
  * noise rule (pass-total spread) is blind to uniform host steal that
  * pollutes EVERY pass of a run equally: r13's closing artifact
  * measured 215.6 s where two sibling runs of the same tree measured
  * 173-193 s, and still self-reported `noisy: false`. The build
  * ledger already gets a round-over-round bar (BuildCost.regressions);
  * query times get the same here — compare this run's per-query
  * min-of-passes against the prior BENCH_HISTORY artifact over the
  * SHARED query names and flag when the shared surface regressed
  * uniformly.
  *
  * The rule is deliberately two-sided so neither real work nor quiet
  * variance trips it:
  *  - a handful of genuinely regressed queries (a changed operator)
  *    moves the median barely and the slower-fraction a little —
  *    quiet;
  *  - a quiet round has roughly half the shared queries a touch
  *    faster and half a touch slower (median ≈ 1.0) — quiet;
  *  - host steal inflates MOST shared queries at once — both the
  *    slower-fraction and the median move together — flagged.
  * Sub-`floorSec` priors are skipped: a 0.05 s query doubling on JIT
  * jitter is not signal.
  */
object BenchNoise {

  final case class Inflation(
      sharedQueries: Int,
      medianRatio: Double,
      fracSlower: Double,
      inflated: Boolean)

  /** Compare current per-query seconds against the prior artifact's.
    * `inflated` = at least `fracBar` of the shared queries are slower
    * AND the median ratio is at least `medianBar` — both must hold.
    */
  def inflationVsPrior(
      current: Map[String, Double],
      prior: Map[String, Double],
      floorSec: Double = 0.2,
      medianBar: Double = 1.15,
      fracBar: Double = 0.7): Inflation = {
    val ratios = current.toSeq.flatMap { case (name, now) =>
      prior.get(name) match {
        case Some(was) if was >= floorSec && now > 0 => Some(now / was)
        case _ => None
      }
    }.sorted
    if (ratios.isEmpty) Inflation(0, 1.0, 0.0, inflated = false)
    else {
      val median = ratios(ratios.length / 2)
      val frac = ratios.count(_ > 1.0).toDouble / ratios.length
      Inflation(ratios.length, median, frac,
        inflated = frac >= fracBar && median >= medianBar)
    }
  }
}
