package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-graph operators (reference `src/graph/document_graph.py`):
  * edge table + BFS by iterated self-join (J5/J6/J7). The reference
  * holds the graph in a Python dict and walks it recursively; here the
  * edge list is a DataFrame and each BFS level is one equi-join — the
  * frontier stays tiny relative to the edge table, so every hop is a
  * broadcast join at scale.
  */
object GraphOps {

  /** Derived demo edge table over `documents`: chain consecutive docs
    * within a source (dst = next doc_id in the same source). */
  def consecutiveEdges(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id").as("src"),
        lead(col("doc_id"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
  }

  /** Min-distance BFS from a seed set, up to maxDepth hops (directed).
    * Returns (node, dist). Iterated joins; dedups by min-dist. */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    var levels = Seq(seeds.select(col("node"), lit(0L).as("dist")))
    var frontier = levels.head
    for (d <- 1 to maxDepth) {
      frontier = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), lit(d.toLong).as("dist"))
      levels = levels :+ frontier
    }
    levels.reduce(_ unionByName _)
      .groupBy("node").agg(min(col("dist")).as("dist"))
  }

  /** J7 relation-chain reconstruction (reference `find_document_chain`,
    * `document_graph.py:469-513`): BFS over directed edges from
    * startId, return the first chain reaching endId within maxDepth
    * hops. The reference returns whichever shortest path its Python
    * queue happens to pop first; here the semantics are made
    * deterministic (SURVEY §7 risk 2): among all simple shortest paths,
    * return the lexicographically smallest node sequence — a
    * declarative spec a recursive-CTE oracle can replicate exactly.
    *
    * Each BFS level is one equi-join expanding every surviving simple
    * path (cycle check via array_contains); the per-level found-it
    * check is a 1-row driver action — a point lookup between two
    * documents, ≤ maxDepth tiny jobs, not a per-row loop. Frontier
    * growth is Σ out-degree^d; for high-fan-out graphs a per-node
    * best-path prune would bound it (at the cost of the lexicographic
    * guarantee on cyclic graphs) — not needed at chain depths ≤ 5.
    *
    * Returns the chain as (step, node) rows — empty when no path, and
    * empty for startId == endId (the reference returns [] for the
    * trivial chain too; pinned by GraphAugmentSpec). */
  def chain(edges: DataFrame, startId: Long, endId: Long,
            maxDepth: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def pathToRows(h: DataFrame): DataFrame =
      h.select(posexplode(col("path")).as(Seq("step", "node")))
        .select(col("step").cast("long").as("step"), col("node"))
    if (startId == endId)
      return Seq((0L, startId)).toDF("step", "node").limit(0)

    var frontier = Seq((startId, Seq(startId))).toDF("node", "path")
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      frontier = frontier.join(edges, col("node") === col("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("node"), concat(col("path"), array(col("dst"))).as("path"))
        .cache()
      val hit = frontier.filter(col("node") === endId)
        .orderBy(col("path")).limit(1)
      if (!hit.isEmpty) return pathToRows(hit)
    }
    Seq((0L, startId)).toDF("step", "node").limit(0)
  }

  /** Related-document lookup (J6): undirected neighbors of an id. */
  def related(edges: DataFrame, id: Long): DataFrame = {
    val out = edges.filter(col("src") === id).select(col("dst").as("node"))
    val in = edges.filter(col("dst") === id).select(col("src").as("node"))
    out.union(in).distinct()
  }

  /** Confidence-weighted undirected BFS (reference
    * `document_graph.py:352-426`): follow edges (src, dst, confidence)
    * both ways, confidence ≥ minConfidence, up to maxDepth hops;
    * path score = mean confidence along the path
    * (`document_graph.py:581`). The reference's visited-set semantics
    * are queue-order dependent; this batch form keeps, per
    * (seed, node), the min-dist path and breaks ties by max score —
    * deterministic (SURVEY §7 risk 4 treatment).
    * Returns (seed, node, dist, path_score), excluding the seeds
    * themselves. */
  def relatedWeighted(edges: DataFrame, seeds: DataFrame,
                      maxDepth: Int = 2,
                      minConfidence: Double = 0.5): DataFrame = {
    val fwd = edges.filter(col("confidence") >= minConfidence)
      .select(col("src"), col("dst"), col("confidence"))
    val undirected = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst"), col("confidence")))

    var frontier = seeds.select(col("node").as("seed"), col("node"),
      lit(0L).as("dist"), lit(0.0).as("conf_sum"))
    var all = frontier
    for (d <- 1 to maxDepth) {
      frontier = frontier.join(undirected, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"),
          lit(d.toLong).as("dist"), (col("conf_sum") + col("confidence")).as("conf_sum"))
      all = all.unionByName(frontier)
    }
    all.filter(col("dist") > 0)
      .join(seeds.select(col("node")), Seq("node"), "left_anti")
      // when-guard: ANSI mode + operator reordering can evaluate the
      // projection on dist=0 seed rows despite the preceding filter
      .withColumn("path_score",
        when(col("dist") > 0, col("conf_sum") / col("dist")).otherwise(lit(0.0)))
      .groupBy(col("seed"), col("node"))
      // min over (dist asc, score desc) as ONE struct so dist and
      // path_score always come from the same path — independent
      // min(dist)/max(score) could pair values from different paths
      .agg(min(struct(col("dist"), (-col("path_score")).as("neg_score")))
        .as("best"))
      .select(col("seed"), col("node"),
        col("best.dist").as("dist"), (-col("best.neg_score")).as("path_score"))
  }
}
