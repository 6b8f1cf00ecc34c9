package graft

/** Pure decision logic for graft.Bench's perf-regression gate, factored
  * out of the harness so it is unit-testable without a SparkSession
  * (r13 verdict item 2: the gate flagged an alphabetically contiguous
  * suite-tail block as 11 "regressions" at host_drift 0.98 — a transient
  * that burned a manual adjudication every round).
  */
object BenchGate {

  /** The regression rule, shared by the main-pass gate and the
    * post-retry recompute: flagged iff the measured time exceeds the
    * drift-normalized ledger entry by BOTH >1.5x relative and >0.25 s
    * absolute (sub-second queries are host-noise-bound). Erroring
    * queries never flag — they surface in the errors map instead. */
  def regressions(timed: Seq[(String, Double, Option[String])],
      baseline: Map[String, Double], norm: Double)
      : Seq[(String, Double, Double)] =
    timed.collect {
      case (name, t, None) if baseline.get(name).exists(b =>
        t > b * norm * 1.5 && t - b * norm > 0.25) => (name, t, baseline(name))
    }

  /** Suite-tail transient signature: every flagged query sits in ONE
    * contiguous run of the execution order (r13: 10 of 11 flags were the
    * adjacent `q_un*`..`q_uuid` block at the end of the run — a host
    * stall during that window, not 10 independent plan regressions).
    * Returns false for an empty flag set and for flags that are spread
    * out (spread flags are the genuine-regression shape). A single flag
    * is trivially contiguous; the caller treats the signal as "retry
    * worthwhile", which is the right call for one flag too. */
  def contiguousBlock(allNames: Seq[String], flagged: Seq[String]): Boolean = {
    if (flagged.isEmpty) return false
    val pos = allNames.zipWithIndex.toMap
    val idx = flagged.flatMap(pos.get)
    if (idx.length != flagged.length) return false // unknown name: no claim
    idx.max - idx.min + 1 == idx.length
  }

  /** Fold a retry pass into the main timings: each retried query keeps
    * the MIN of its suite reading and its retry reading (same
    * discipline as the two main passes). Error slots: a suite error is
    * kept verbatim; a retry error on a suite-PASSING query also
    * surfaces (conservative — a query that fails on re-run is broken,
    * whatever its first pass said). */
  def foldRetry(timed: Seq[(String, Double, Option[String])],
      retry: Map[String, (Double, Option[String])])
      : Seq[(String, Double, Option[String])] =
    timed.map { case (name, t, err) =>
      retry.get(name) match {
        case Some((rt, rerr)) => (name, math.min(t, rt), err.orElse(rerr))
        case None => (name, t, err)
      }
    }
}
