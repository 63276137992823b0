package graft.util

/** Cross-RUN inflation detector (r13 verdict task 6, tightened in
  * r15). The in-run noise rule (pass-total spread) is blind to
  * uniform host steal that pollutes EVERY pass of a run equally:
  * r13's closing artifact measured 215.6 s where two sibling runs of
  * the same tree measured 173-193 s, and still self-reported
  * `noisy: false`. The build ledger already gets a round-over-round
  * bar (BuildCost.regressions); query times get the same here —
  * compare this run's per-query min-of-passes against a prior
  * baseline over the SHARED query names and flag when the shared
  * surface regressed uniformly.
  *
  * BASELINE SELECTION (r14 advice): comparing against the single
  * latest BENCH_HISTORY artifact lets an inflated baseline mask
  * current inflation — r14's final 244.4 s steal-window run measured
  * 1.08/0.69 (under the 1.15/0.7 bars) only because its baseline was
  * r13's own steal-polluted artifact. The baseline is therefore the
  * PER-QUERY MIN across the last `maxBaselines` recorded artifacts
  * that are (a) at the same sf and (b) self-labeled quiet
  * (`noisy:false` and not `inflated_vs_prior`) — a double-polluted
  * pair cannot hide a floor that any one quiet recent round set.
  * Measured on the committed artifacts: r13 (1.17/0.81), the r14
  * closing run (1.20/0.93) and the r14 steal run (1.24/0.91) all trip
  * the 1.15/0.7 bars against their min-of-eligible baseline, while
  * the r14 QUIET run stays under (1.11 median) — exactly the
  * adjudications the r13/r14 judges made by hand.
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
  * jitter is not signal. A NEAR-BAR band (frac ≥ 0.65 AND median ≥
  * 1.10) is surfaced as `suspect` without flipping `noisy` — against
  * a min-of-K floor even quiet runs sit slightly above 1.0, so the
  * band is a review signal, not a verdict.
  */
object BenchNoise {

  final case class Inflation(
      sharedQueries: Int,
      medianRatio: Double,
      fracSlower: Double,
      inflated: Boolean,
      suspect: Boolean)

  /** Compare current per-query seconds against the baseline's.
    * `inflated` = at least `fracBar` of the shared queries are slower
    * AND the median ratio is at least `medianBar` — both must hold.
    * `suspect` = the same conjunction at the near bars.
    */
  def inflationVsPrior(
      current: Map[String, Double],
      prior: Map[String, Double],
      floorSec: Double = 0.2,
      medianBar: Double = 1.15,
      fracBar: Double = 0.7,
      nearMedianBar: Double = 1.10,
      nearFracBar: Double = 0.65): Inflation = {
    val ratios = current.toSeq.flatMap { case (name, now) =>
      prior.get(name) match {
        case Some(was) if was >= floorSec && now > 0 => Some(now / was)
        case _ => None
      }
    }.sorted
    if (ratios.isEmpty)
      Inflation(0, 1.0, 0.0, inflated = false, suspect = false)
    else {
      val median = ratios(ratios.length / 2)
      val frac = ratios.count(_ > 1.0).toDouble / ratios.length
      Inflation(ratios.length, median, frac,
        inflated = frac >= fracBar && median >= medianBar,
        suspect = frac >= nearFracBar && median >= nearMedianBar)
    }
  }

  /** The fields of one recorded bench artifact this rule consumes,
    * parsed from the artifact's own JSON text (no JSON lib on the
    * classpath — the artifacts are single-line, machine-written, and
    * the regexes below are the writers' own formats).
    */
  final case class Artifact(
      sf: Option[String],
      noisy: Boolean,
      inflatedVsPrior: Boolean,
      queries: Map[String, Double],
      builds: Map[String, Double])

  def parseArtifact(txt: String): Artifact = {
    def block(key: String): Map[String, Double] =
      ("\"" + key + "\":\\{([^}]*)\\}").r.findFirstMatchIn(txt)
        .map(_.group(1))
        .map { body =>
          "\"([^\"]+)\":([0-9.Ee+-]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }.getOrElse(Map.empty[String, Double])
    def flag(key: String): Boolean =
      ("\"" + key + "\":(true|false)").r.findFirstMatchIn(txt)
        .exists(_.group(1) == "true")
    Artifact(
      sf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1)),
      noisy = flag("noisy"),
      inflatedVsPrior = flag("inflated_vs_prior"),
      queries = block("queries"),
      builds = block("builds"))
  }

  /** Select the baseline from recorded artifacts, newest first:
    * artifacts at a DIFFERENT sf are skipped outright (cross-scale
    * ratios are meaningless — r14 advice), self-labeled polluted ones
    * (`noisy` or `inflated_vs_prior`) are skipped as baselines, and
    * the per-key min across the newest `maxBaselines` survivors is
    * the floor. Returns (roundsUsed, perQueryMin, perBuildMin).
    */
  def baseline(recorded: Seq[(Int, Artifact)], currentSf: String,
      maxBaselines: Int = 3)
      : (Seq[Int], Map[String, Double], Map[String, Double]) = {
    val eligible = recorded.sortBy(-_._1).filter { case (_, a) =>
      a.sf.contains(currentSf) && !a.noisy && !a.inflatedVsPrior
    }.take(maxBaselines)
    def minOf(ms: Seq[Map[String, Double]]): Map[String, Double] =
      ms.flatMap(_.keySet).distinct.map { k =>
        k -> ms.flatMap(_.get(k)).min
      }.toMap
    (eligible.map(_._1), minOf(eligible.map(_._2.queries)),
      minOf(eligible.map(_._2.builds)))
  }
}
