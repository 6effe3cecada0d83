package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph-traversal primitives re-expressing Solr's streaming
  * graph expressions (reference:
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/GatherNodesStream.java,
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/ShortestPathStream.java).
  *
  * The reference walks the graph with one search per frontier batch against
  * a single collection; here each hop is a distributed equi-join of the
  * frontier against the edge table — level-synchronous BFS (the Pregel
  * shape), so a hop over a 100 TB edge table is one shuffle keyed on the
  * join column, and the frontier stays a DataFrame end to end (no
  * driver-side node sets; Solr's own ShortestPathStream keeps `visited` on
  * one node, which caps it far below that).
  *
  * Depth is bounded by the caller (both reference streams require maxDepth
  * / a fixed walk spec), so the driver loop issues a FIXED number of joins
  * — the loop itself never depends on data values, only the stopping check
  * (`limit(1).isEmpty`) does, mirroring ShortestPathStream's per-level
  * "found targets?" probe. */
object GraphOps {

  /** One `gatherNodes` hop: frontier × edges on `from`, emitting distinct
    * `to` values (GatherNodesStream gathers unique node values per level;
    * reference: GatherNodesStream.java — the `unique` wrapping of each
    * level's emitted tuples). `frontier` and the result are single-column
    * DataFrames named `node`. */
  def gather(frontier: DataFrame, edges: DataFrame, from: String, to: String): DataFrame =
    edges.join(frontier.withColumnRenamed("node", from), from)
      .select(col(to).as("node"))
      .distinct()

  /** Level-synchronous BFS returning EVERY shortest path from `source` to
    * `target` as an array-of-node column `path` (ShortestPathStream emits
    * one tuple per discovered shortest path). `edges` has columns
    * (`src`, `dst`); `maxDepth` bounds the walk exactly like the
    * reference's `maxDepth` param. Paths are simple (a path never revisits
    * a node — a shortest path cannot), enforced per-branch with
    * `array_contains`, NOT with a global visited set: two shortest paths
    * may share an intermediate node, and the reference also collects all
    * of them. Each level is one shuffle (frontier ⋈ edges); the check
    * "did any branch reach the target" is a `limit(1)` job per level,
    * the distributed analog of ShortestPathStream's per-iteration found
    * test. */
  def shortestPaths(
      edges: DataFrame,
      source: String,
      target: String,
      maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var frontier = Seq((source, Seq(source))).toDF("node", "path")
    var depth = 0
    var found = source == target
    while (!found && depth < maxDepth) {
      frontier = frontier
        .join(edges.withColumnRenamed("src", "node"), "node")
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("node"), concat(col("path"), array(col("dst"))).as("path"))
      // one lightweight job per level: the reference's found-targets probe
      frontier.persist()
      found = !frontier.filter(col("node") === target).isEmpty
      depth += 1
      if (!found && frontier.isEmpty) return frontier.filter(lit(false)) // exhausted
    }
    if (!found) frontier.filter(lit(false))
    else frontier.filter(col("node") === target)
  }

  /** Connected components by min-label propagation: every node repeatedly
    * takes the smallest label among itself and its neighbors — one join +
    * one groupBy per round, converging in O(component diameter) rounds to
    * label = min node id of the component. `edges` has long columns
    * (`src`, `dst`), interpreted UNDIRECTED; returns (`id`, `lbl`) for every
    * node with at least one edge. The driver-side work per round is a single
    * convergence boolean; `localCheckpoint` caps lineage. Near-dup clusters
    * (the dedup use) have tiny diameters; for adversarially long chains the
    * alternating small-star/large-star transform of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" (SoCC'14), is the
    * drop-in replacement with O(log²) rounds. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 15): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var lbl = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbr = und.join(lbl, und("dst") === lbl("id"))
        .select(und("src").as("id"), col("lbl"))
      val next = lbl.select("id", "lbl").union(nbr)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      converged = next.join(lbl.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") < col("old")).isEmpty
      lbl = next
      iter += 1
    }
    lbl
  }
}
