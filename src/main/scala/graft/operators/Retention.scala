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

  /** Cohort lifetime value — the revenue twin of [[cohortMatrix]]:
    * customers cohorted by first-purchase month, then per (cohort,
    * month-offset) cell the active customers, exact-cent revenue, and
    * the running cumulative revenue — the LTV triangle finance reads
    * off the diagonal. Month arithmetic is pure integers
    * (y·12+m), immune to calendar-interval edge cases. One aggregate on
    * the customer key (broadcast cohort table), one keyed join, one
    * two-key aggregate; the cumulative window runs on the
    * cohorts × offsets frame only (months², bounded). `amountCents`
    * must be an exact integer column expression. */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
      amountCents: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val om = orders.select(col(custCol).as("cust"),
      (year(col(dateCol)) * 12 + month(col(dateCol)) - 1).as("m"),
      amountCents.as("cents"))
    val cohort = om.groupBy("cust").agg(min("m").as("cm"))
    val cells = om.join(broadcast(cohort), "cust")
      .groupBy(col("cm"), (col("m") - col("cm")).as("month_offset"))
      .agg(countDistinct("cust").as("n_active"),
        sum("cents").as("revenue_cents"))
    val w = Window.partitionBy("cm").orderBy("month_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
      .select(concat(lpad(expr("cm div 12").cast("string"), 4, "0"), lit("-"),
          lpad((pmod(col("cm"), lit(12)) + 1).cast("string"), 2, "0"))
          .as("cohort_month"),
        col("month_offset").cast("long").as("month_offset"),
        col("n_active"), col("revenue_cents"), col("cum_revenue_cents"))
      .orderBy("cohort_month", "month_offset")
  }
}
