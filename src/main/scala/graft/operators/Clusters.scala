package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-duplicate
  * pair list (SURVEY.md §2 B-10). Pairwise dedup operators (exact /
  * n-gram-Jaccard / MinHash / SimHash / embedding-cosine) emit EDGES; a real
  * pipeline must then group transitively-connected documents into one
  * cluster and keep a single canonical representative — A~B and B~C must
  * collapse to one kept document even when A~C was never emitted as a pair.
  *
  * Algorithm: iterative min-label propagation with path compression.
  * Each round every vertex takes the minimum label among itself and its
  * neighbours (one shuffle: edge-label join + min aggregate), then labels
  * are compressed one hop (`comp := comp(comp)`, a self-join) — the
  * pointer-halving step that turns O(diameter) convergence into
  * O(log diameter) rounds, the same round bound as the large-star/small-star
  * MapReduce formulation. Every round is a constant number of
  * hash-partitioned joins on vertex id — no single-partition step anywhere,
  * so each round scales like any other shuffle; `localCheckpoint` truncates
  * the growing lineage (the standard iterative-DataFrame requirement — at
  * production scale a reliable `checkpoint()` dir instead).
  *
  * Convergence is detected by an exact changed-label count per round (an
  * `isEmpty` probe — stops at the fixpoint rather than running a worst-case
  * round budget).
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges`
    * (`aCol`, `bCol`): returns (id, comp) with `comp` = the minimum vertex
    * id reachable from `id`. Only vertices that appear in `edges` are
    * returned — isolated documents are their own (implicit) cluster and are
    * reattached by the caller with a left join + coalesce. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(eager = false) // joined every round — materialize once
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(eager = false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among neighbours (one narrow shuffle on vertex id)
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("comp").as("nbr_comp"))
      // checkpoint BEFORE the compression self-join: it consumes
      // `propagated` twice, and Spark has no plan-level CSE — unckeckpointed,
      // the neighbour-min join would be planned (and run) on both sides
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint(eager = true)
      // path compression: comp := comp(comp) — labels only ever decrease,
      // so following the label's own label one hop is always sound and
      // halves the remaining pointer-chain depth. No checkpoint needed:
      // `next` is one shallow join over the checkpointed `propagated`, so
      // per-round lineage stays bounded either way.
      val next = propagated
        .join(propagated.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
      converged = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    // exhausting the round budget would silently return labels that are NOT
    // components (transitively-connected vertices still apart) — refuse
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds — " +
        "raise maxIter (compression makes rounds ~log2(diameter))")
    labels
  }
}
