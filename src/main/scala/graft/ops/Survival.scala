package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over entity lifetimes (Kaplan &
  * Meier 1958) — the product-limit estimator every churn/retention
  * analysis reduces to. The reference's surface has cohort retention
  * (agg_retention); KM generalizes it with CENSORING: users still
  * active at the study boundary contribute to the risk set without
  * counting as churn events, which plain retention matrices get wrong.
  *
  * Scale shape: one corpus-wide groupBy(user) for lifetimes (shuffle on
  * the user key, map-side combined) feeding one groupBy(duration) —
  * whose cardinality is bounded by the study length in DAYS (a few
  * thousand rows for a decade), genuinely model-sized. The risk-set
  * cumulation and the survival product then fold on the DRIVER over
  * that day-bounded table (the isotonic-bins discipline: sufficient
  * statistics distributed, model-sized estimator local) — deliberately
  * NOT a global Window, which the plan audit rejects because an
  * empty-partition window is corpus-fatal in the general case. The
  * µs-event table never sorts globally.
  */
object Survival {

  /** Per-duration KM table: `dur_days`, `n_risk` (at-risk count entering
    * the duration), `n_events` (churns AT the duration), `survival`
    * (running product-limit, rounded 6), and `cumhaz` (the Nelson-Aalen
    * cumulative hazard Σ dᵢ/nᵢ, rounded 6 — the additive twin the
    * log-rank family builds on). A user is an EVENT (churned) if
    * their last activity predates the corpus max by more than
    * `censorHours`; otherwise they are right-censored at their observed
    * lifetime. Only event-carrying durations emit (the KM step points);
    * censored-only durations shrink later risk sets silently, exactly
    * the estimator's definition.
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      censorHours: Int): DataFrame = {
    val spark = events.sparkSession
    val u = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("f"), max(col(tsCol)).as("l"))
    val mx = events.agg(max(col(tsCol)).as("study_end"))
    val d = u.crossJoin(broadcast(mx))
      .select(
        datediff(to_date(col("l")), to_date(col("f"))).cast("long").as("dur_days"),
        (col("l") < col("study_end") - expr(s"INTERVAL $censorHours HOURS"))
          .cast("long").as("died"))
    val byDur = d.groupBy("dur_days")
      .agg(sum("died").as("n_events"), count(lit(1)).as("n_ending"))
      .orderBy("dur_days")
      .collect() // day-bounded: the estimator's sufficient statistics
    // descending pass: risk set entering d = Σ endings at durations ≥ d
    var risk = 0L
    val withRisk = byDur.reverseIterator.map { r =>
      risk += r.getLong(2)
      (r.getLong(0), risk, r.getLong(1))
    }.toArray.reverse
    // ascending pass: product-limit + Nelson-Aalen over event durations.
    // The survival product accumulates in LOG space — s = exp(Σ ln(1-d/n))
    // — executing the SAME IEEE op sequence as the SQL oracle's
    // exp(sum(ln(1-d/n)) OVER (...)), so the two engines cannot land on
    // opposite sides of a 6th-decimal rounding boundary (sequential
    // multiplication is a DIFFERENT float path that can differ by an ulp)
    var sLn = 0.0
    var h = 0.0
    val rows = withRisk.collect { case (dur, nRisk, nEvents) if nEvents > 0 =>
      sLn += math.log(1.0 - nEvents.toDouble / nRisk)
      h += nEvents.toDouble / nRisk
      (dur, nRisk, nEvents, math.rint(math.exp(sLn) * 1e6) / 1e6,
        math.rint(h * 1e6) / 1e6)
    }
    import spark.implicits._
    rows.toSeq.toDF("dur_days", "n_risk", "n_events", "survival", "cumhaz")
  }
}
