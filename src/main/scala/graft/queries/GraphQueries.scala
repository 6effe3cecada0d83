package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Graph-stream queries over the TPC-H-ish order graph — the engine analog
  * of Solr's streaming graph expressions (reference:
  * solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/GatherNodesStream.java,
  * ShortestPathStream.java). Both are DuckDB-oracle-checkable: gatherNodes
  * is two DISTINCT equi-join hops; shortestPath is a recursive CTE. */
object GraphQueries {

  private def pq(spark: SparkSession, sfDir: String, t: String): DataFrame =
    spark.read.parquet(s"$sfDir/$t.parquet")

  /** The nation-level trade graph: NATION_a -> NATION_b iff customers in a
    * bought >= `minCnt` lineitems from suppliers in b. Self-loops dropped.
    * A single aggregation over the lineitem⋈orders⋈customer⋈supplier star.
    *
    * r06: the RESULT (≤ nations² rows) is persisted — every BFS hop of
    * q_graph_reach / q_graph_shortest re-joined the whole lineitem star per
    * frontier level otherwise (measured 10.5 s/query at sf0.1, 2.6 s with
    * the cached edges; plan-keyed bounded cache). customer/supplier lost
    * their forced broadcast hints (SF-scaled tables — same reasoning as
    * q_join_star; the planner broadcasts them at bench scale from real
    * size estimates, 100x gets a safe shuffled join). nation stays hinted. */
  private def tradeEdges(spark: SparkSession, sfDir: String, minCnt: Long): DataFrame = {
    val l = pq(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = pq(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val c = pq(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val s = pq(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    val n = pq(spark, sfDir, "nation").select("n_nationkey", "n_name")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n.as("cn")), c("c_nationkey") === col("cn.n_nationkey"))
      .join(broadcast(n.as("sn")), s("s_nationkey") === col("sn.n_nationkey"))
      .filter(col("cn.n_name") =!= col("sn.n_name"))
      .groupBy(col("cn.n_name").as("src"), col("sn.n_name").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCnt)
      .select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // {!graph} reachability closure (reference: solr/core/src/java/org/
    // apache/solr/search/join/GraphQParserPlugin.java + GraphQuery.java —
    // the doc set reachable from a seed following from->to edges up to
    // maxDepth): BFS over the nation trade graph, maxDepth = 2, emitting
    // every reached node with its minimum depth. Each hop is one distinct
    // equi-join (GraphOps.gather) — frontier-sized, never whole-graph.
    "q_graph_reach" -> ((spark, sfDir) => {
      import spark.implicits._
      val edges = tradeEdges(spark, sfDir, 150)
      val seed = Seq("NATION_1").toDF("node")
      val h1 = GraphOps.gather(seed, edges, "src", "dst")
      val h2 = GraphOps.gather(h1, edges, "src", "dst")
      seed.select(col("node"), lit(0L).as("lvl"))
        .unionAll(h1.select(col("node"), lit(1L).as("lvl")))
        .unionAll(h2.select(col("node"), lit(2L).as("lvl")))
        .groupBy("node").agg(min("lvl").as("depth"))
        .orderBy("depth", "node")
    }),
    // gatherNodes walk (GatherNodesStream): seed customers -> their orders
    // -> the suppliers on those orders; one distinct-join per hop, each a
    // single shuffle on the hop key. Output: (level, node) distinct pairs.
    "q_graph_gather" -> ((spark, sfDir) => {
      val seeds = pq(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9900)
        .select(col("c_custkey").as("node"))
      val orders = GraphOps.gather(seeds,
        pq(spark, sfDir, "orders").select("o_custkey", "o_orderkey"),
        "o_custkey", "o_orderkey")
      val supps = GraphOps.gather(orders,
        pq(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey"),
        "l_orderkey", "l_suppkey")
      seeds.select(lit(0).as("level"), col("node"))
        .unionAll(orders.select(lit(1).as("level"), col("node")))
        .unionAll(supps.select(lit(2).as("level"), col("node")))
        .orderBy("level", "node")
    }),
    // scoreNodes (ScoreNodesStream.java:243): tf-idf over gathered nodes —
    // nodeScore = (ln(termFreq) + 1) * (ln((numDocs + 1)/(docFreq + 1)) + 1)
    // where termFreq = how often the walk reached the node (count, not
    // distinct), docFreq = the node's frequency in the whole collection,
    // numDocs = collection size. Here: suppliers reached from high-balance
    // BUILDING customers' orders, frequencies over the lineitem table.
    "q_graph_scorenodes" -> ((spark, sfDir) => {
      val seeds = pq(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9900)
        .select(col("c_custkey"))
      val seedOrders = pq(spark, sfDir, "orders").select("o_custkey", "o_orderkey")
        .join(broadcast(seeds), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey")
      val li = pq(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
      val tf = li.join(broadcast(seedOrders), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").as("node")).agg(count(lit(1)).as("term_freq"))
      val dfreq = li.groupBy(col("l_suppkey").as("node")).agg(count(lit(1)).as("doc_freq"))
      val nd = li.agg(count(lit(1)).as("num_docs"))
      val score = (log(col("term_freq").cast("double")) + lit(1.0)) *
        (log((col("num_docs").cast("double") + lit(1.0)) /
             (col("doc_freq").cast("double") + lit(1.0))) + lit(1.0))
      tf.join(dfreq, "node").crossJoin(broadcast(nd))
        .select(col("node"), col("term_freq"), col("doc_freq"),
          (floor(score * lit(100000.0) + lit(0.5)).cast("double") / lit(100000.0)).as("node_score"))
        .orderBy(desc("node_score"), asc("node")).limit(20)
    }),
    // shortestPath (ShortestPathStream): level-synchronous BFS over the
    // trade graph; emits every shortest path source->target as a string.
    "q_graph_shortest" -> ((spark, sfDir) => {
      val edges = tradeEdges(spark, sfDir, 150)
      GraphOps.shortestPaths(edges, "NATION_1", "NATION_7", maxDepth = 4)
        .select(array_join(col("path"), "->").as("path"),
          (size(col("path")) - 1).cast("int").as("depth"))
        .orderBy("path")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_graph_reach" ->
      """WITH edges AS (
        |  SELECT cn.n_name AS src, sn.n_name AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE cn.n_name <> sn.n_name
        |  GROUP BY 1, 2 HAVING count(*) >= 150),
        |h0 AS (SELECT 'NATION_1' AS node),
        |h1 AS (SELECT DISTINCT dst AS node FROM edges JOIN h0 ON src = h0.node),
        |h2 AS (SELECT DISTINCT dst AS node FROM edges JOIN h1 ON src = h1.node),
        |u AS (
        |  SELECT node, 0 AS lvl FROM h0
        |  UNION ALL SELECT node, 1 FROM h1
        |  UNION ALL SELECT node, 2 FROM h2)
        |SELECT node, CAST(min(lvl) AS BIGINT) AS depth
        |FROM u GROUP BY node ORDER BY depth, node""".stripMargin,
    "q_graph_gather" ->
      """WITH seed AS (
        |  SELECT c_custkey AS node FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900),
        |l1 AS (SELECT DISTINCT o_orderkey AS node FROM orders
        |       JOIN seed ON o_custkey = seed.node),
        |l2 AS (SELECT DISTINCT l_suppkey AS node FROM lineitem
        |       JOIN l1 ON l_orderkey = l1.node)
        |SELECT 0 AS level, node FROM seed
        |UNION ALL SELECT 1, node FROM l1
        |UNION ALL SELECT 2, node FROM l2
        |ORDER BY level, node""".stripMargin,
    "q_graph_scorenodes" ->
      """WITH seed AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900),
        |so AS (SELECT o_orderkey FROM orders JOIN seed ON o_custkey = c_custkey),
        |tf AS (SELECT l_suppkey AS node, count(*) AS term_freq
        |       FROM lineitem JOIN so ON l_orderkey = o_orderkey GROUP BY 1),
        |df AS (SELECT l_suppkey AS node, count(*) AS doc_freq
        |       FROM lineitem GROUP BY 1),
        |nd AS (SELECT count(*) AS num_docs FROM lineitem)
        |SELECT tf.node, term_freq, doc_freq,
        |  floor((ln(CAST(term_freq AS DOUBLE)) + 1.0)
        |      * (ln((CAST(num_docs AS DOUBLE) + 1.0) / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0)
        |      * 100000.0 + 0.5) / 100000.0 AS node_score
        |FROM tf JOIN df ON tf.node = df.node, nd
        |ORDER BY node_score DESC, tf.node LIMIT 20""".stripMargin,
    "q_graph_shortest" ->
      """WITH RECURSIVE edges AS (
        |  SELECT cn.n_name AS src, sn.n_name AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE cn.n_name <> sn.n_name
        |  GROUP BY 1, 2 HAVING count(*) >= 150
        |),
        |walk AS (
        |  SELECT 'NATION_1' AS node, ['NATION_1'] AS path, 0 AS depth
        |  UNION ALL
        |  SELECT e.dst, list_append(w.path, e.dst), w.depth + 1
        |  FROM walk w JOIN edges e ON e.src = w.node
        |  WHERE w.depth < 4 AND NOT list_contains(w.path, e.dst)
        |    AND w.node <> 'NATION_7'
        |)
        |SELECT array_to_string(path, '->') AS path, CAST(depth AS INT) AS depth
        |FROM walk
        |WHERE node = 'NATION_7'
        |  AND depth = (SELECT min(depth) FROM walk WHERE node = 'NATION_7')
        |ORDER BY path""".stripMargin
  )
}
