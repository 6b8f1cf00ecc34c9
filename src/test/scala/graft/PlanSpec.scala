package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions: the 100 TB design claims in the query Scaladoc
  * are checked here against the actual plans — pushdown reaches the scan,
  * dimension joins broadcast, global sort+limit becomes TakeOrdered, and
  * approximate aggregates stay single-pass (SURVEY.md §4.2). */
class PlanSpec extends SparkSpec {

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_parquet pushes its predicate into the parquet scan") {
    val p = planString(graft.queries.Filters.qScanParquet(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_quantity"), p)
    // projection pruning: only the 4 referenced columns in ReadSchema
    assert(!p.contains("l_comment") && !p.contains("l_tax"), p)
  }

  test("q_join_broadcast plans broadcast joins for both dims") {
    val p = planString(graft.queries.Joins.qJoinBroadcast(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_sort_limit plans TakeOrderedAndProject (no global sort)") {
    val p = planString(graft.queries.Windows.qSortLimit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_filter_pred aggregates with partial (map-side) aggregation") {
    val p = planString(graft.queries.Filters.qFilterPred(spark, sf))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial"), p)
  }

  test("envelope sink is shuffle-free (no Exchange in the plan)") {
    val p = planString(
      graft.operators.EnvelopeSink.kafkaRows(Tables.events(spark, sf), "none"))
    assert(!p.contains("Exchange"), p)
  }

  test("as-of join is the single-shuffle union+window plan, no join explosion") {
    val df = graft.queries.Joins.qJoinAsof(spark, sf)
    val p = planString(df)
    // union+window formulation: no physical join operator at all, and only
    // the window partitioning + final orderBy exchanges — never a per-event
    // candidate join
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected one hash exchange, plan:\n$p")
  }

  test("resample/sessionize are single-shuffle window plans, no joins") {
    for (df <- Seq(graft.queries.Windows.qResampleFfill(spark, sf),
        graft.queries.Windows.qSessionize(spark, sf))) {
      val p = planString(df)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
      assert(p.contains("Window"), p)
    }
  }

  test("gated dedup plans contain no cartesian/nested-loop product") {
    // the quadratic all-pairs shapes are exactly what the LSH gates replace —
    // lock the property in at the plan level
    for (df <- Seq(
        graft.queries.LlmOps.qDedupEmbed(spark, sf),
        graft.queries.LlmOps.qDedupNear(spark, sf),
        graft.queries.LlmOps.qDedupSimhash(spark, sf))) {
      val p = planString(df)
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    }
  }

  test("packing/mixture plans window per shard/source, never a global window") {
    for (df <- Seq(graft.queries.LlmOps.qPackChunks(spark, sf),
        graft.queries.LlmOps.qMixSources(spark, sf))) {
      val p = planString(df)
      assert(p.contains("Window"), p.take(2000))
      // a window without a partition spec collapses everything onto one
      // task (Exchange SinglePartition) — the 100 TB killer this layout
      // deliberately avoids by packing per shard / ranking per source
      assert(!p.contains("SinglePartition"), p.take(2000))
      assert(!p.contains("CartesianProduct"), p.take(2000))
    }
  }

  test("semi/anti joins stay semi/anti at the physical level") {
    val semi = planString(graft.queries.Joins.qJoinSemi(spark, sf))
    assert(semi.contains("LeftSemi"), semi)
    val anti = planString(graft.queries.Joins.qJoinAnti(spark, sf))
    assert(anti.contains("LeftAnti"), anti)
  }

  test("BM25 top-k is TakeOrderedAndProject over partially-aggregated postings") {
    val p = planString(graft.queries.CorpusOps.qBm25(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("partial"), p.take(2000))
    // the query-vocabulary filter must run before the aggregate fan-in,
    // not after: postings traffic ∝ query-term hits, not corpus tokens
    assert(p.contains("INSET") || p.contains(" IN ("), p.take(2000))
  }

  test("e2e pipeline plans per-shard windows and no cartesian products") {
    val p = planString(graft.queries.CorpusOps.qPipelineE2e(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // both windows (dedup hash, shard packing) must be partitioned — a
    // SinglePartition window would serialize the whole corpus
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("SinglePartition"), p.take(2000))
  }

  test("PII redaction and hash sampling plan zero exchanges beyond the dump sort") {
    for (df <- Seq(graft.queries.CorpusOps.qPiiRedact(spark, sf),
        graft.queries.CorpusOps.qSampleHash(spark, sf))) {
      // physical plan (Exchange nodes only exist there): the single allowed
      // exchange is the rangepartitioning for the Verify determinism
      // orderBy — the operator body (projection + filter) must not shuffle
      val p = planString(df)
      val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges == 1 && p.contains("rangepartitioning"), p.take(2000))
    }
  }
}
