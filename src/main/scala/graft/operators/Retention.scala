package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention (SURVEY.md §2 B-10 analytics): users grouped by their
  * first activity period, distinct active users per (cohort, offset).
  *
  * Scale shape: the per-user cohort table is one aggregate on the user key
  * and broadcasts; the activity table shuffles once for its distinct and
  * once for the final two-key count — all bounded by user cardinality,
  * never by raw event volume (the week projection collapses events first).
  */
object Retention {

  /** The retention matrix (cohort, offset, n_users) from per-user activity
    * periods: `df` rows are (userCol, periodCol) observations, cohort =
    * each user's minimum period. */
  def cohortMatrix(df: DataFrame, userCol: String, periodCol: String): DataFrame = {
    val activity = df.select(col(userCol), col(periodCol)).distinct()
    val cohort = activity.groupBy(userCol)
      .agg(min(periodCol).as("cohort_week"))
    activity
      .join(broadcast(cohort), userCol)
      .groupBy(col("cohort_week"),
        (col(periodCol) - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(userCol).as("n_users"))
  }
}
