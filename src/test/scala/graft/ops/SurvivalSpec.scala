package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Kaplan-Meier on a hand-computable cohort: 5 users, known lifetimes,
  * one censored — the estimator's textbook table.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0) =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  test("hand-computed KM table with right-censoring") {
    // study end = Jan 20. censorHours = 24 → churned iff last < Jan 19.
    // user lifetimes (first..last): u1 0..2 (churn), u2 0..2 (churn),
    // u3 0..5 (churn), u4 0..19 (active, censored), u5 0..20 (defines end)
    val events = Seq(
      (1L, ts(1)), (1L, ts(3)),
      (2L, ts(1)), (2L, ts(3)),
      (3L, ts(1)), (3L, ts(6)),
      (4L, ts(1)), (4L, ts(20)),
      (5L, ts(1)), (5L, ts(20, 12))
    ).toDF("user_id", "ts")
    val km = Survival.kaplanMeier(events, "user_id", "ts", censorHours = 24)
      .orderBy("dur_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // durations: u1,u2 = 2d (events), u3 = 5d (event), u4 = 19d censored
    // (last Jan-20 00:00 < end Jan-20 12:00 − 24h? No: Jan-19 12:00 —
    // Jan-20 00:00 is AFTER, so u4 is censored), u5 censored.
    // risk sets: dur 2 → 5 at risk, 2 events → S = 3/5 = 0.6, H = 0.4
    //            dur 5 → 3 at risk, 1 event  → S = 0.6·2/3 = 0.4,
    //                                          H = 0.4 + 1/3 = 0.733333
    assert(km.toSeq == Seq((2L, 5L, 2L, 0.6, 0.4),
      (5L, 3L, 1L, 0.4, 0.733333)))
  }

  test("no churners yields an empty step table, not a failure") {
    val events = Seq((1L, ts(1)), (1L, ts(19)), (2L, ts(1)), (2L, ts(20)))
      .toDF("user_id", "ts")
    assert(Survival.kaplanMeier(events, "user_id", "ts",
      censorHours = 72).count() == 0L)
  }

  test("survival is non-increasing and within (0, 1] on the fixture") {
    val events = graft.sources.Events.read(spark,
      "/root/testdata/sf0.001/events.parquet")
    val km = Survival.kaplanMeier(events, "user_id", "ts", censorHours = 24)
      .orderBy("dur_days").collect().map(_.getDouble(3))
    km.foreach(s => assert(s > 0.0 && s <= 1.0))
    km.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-12)
      case _ =>
    }
  }
}
