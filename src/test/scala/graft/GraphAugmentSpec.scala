package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.retrieval.HybridSearch

/** J5 graph augmentation + V13 visual-element search. */
class GraphAugmentSpec extends SparkSpec {
  import spark.implicits._

  test("relatedWeighted: undirected, confidence-filtered, 2 hops, mean path score") {
    // a -0.9-> b -0.8-> c ; a -0.4-> d (below threshold); e <-0.9- b (reverse)
    val edges = Seq(
      ("a", "b", 0.9), ("b", "c", 0.8), ("a", "d", 0.4), ("e", "b", 0.9))
      .toDF("src", "dst", "confidence")
    val seeds = Seq("a").toDF("node")
    val rel = GraphOps.relatedWeighted(edges, seeds, maxDepth = 2)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rel.keySet == Set("b", "c", "e"))
    assert(rel("b") == ((1L, 0.9)))
    assert(rel("c")._1 == 2L)
    assert(math.abs(rel("c")._2 - (0.9 + 0.8) / 2) < 1e-12)
    assert(rel("e")._1 == 2L) // via b, reverse edge
    assert(!rel.contains("d")) // confidence 0.4 < 0.5
  }

  test("augmentWithGraph appends top unseen related docs (J5)") {
    val results = Seq(
      ("c1", "docA", 0.9), ("c2", "docB", 0.8)).toDF("id", "document_id", "rrf_score")
    val edges = Seq(
      ("docA", "docX", 0.9), ("docA", "docY", 0.6), ("docB", "docA", 0.7),
      ("docX", "docZ", 0.95)).toDF("src", "dst", "confidence")
    val out = HybridSearch.augmentWithGraph(results, edges, maxAugmented = 2)
      .collect()
    val augmented = out.filter(_.getAs[Boolean]("is_augmented"))
    assert(out.length == 4)
    // docX scores (0.9)/1, docZ (0.9+0.95)/2=0.925, docY 0.6 → top2 = docZ, docX
    assert(augmented.map(_.getAs[String]("id")).toSet == Set("docX", "docZ"))
    // already-seen docs never re-added
    assert(!augmented.exists(r => Set("docA", "docB")(r.getAs[String]("id"))))
  }

  test("visual-element search filters by element_type and ranks by MaxSim (V13)") {
    def patches(seed: Int): Seq[Seq[Double]] =
      (0 until 4).map(r => (0 until 16).map(i =>
        graft.functions.EmbedFunctions.embedQuery(Seq(s"tok$seed$r"), 16)(i)))
    val elements = Seq(
      ("e1", "d1", "Table", patches(1)),
      ("e2", "d1", "Image", patches(2)),
      ("e3", "d2", "Table", patches(3)))
      .toDF("id", "document_id", "element_type", "patches")
    val res = HybridSearch.visualElementSearch(
      elements, "revenue table data", 10, elementTypes = Seq("Table"))
      .collect()
    assert(res.length == 2)
    assert(res.forall(_.getAs[String]("element_type") == "Table"))
    // deterministic ordering by (score desc, id)
    val again = HybridSearch.visualElementSearch(
      elements, "revenue table data", 10, elementTypes = Seq("Table")).collect()
    assert(res.map(_.getString(0)).sameElements(again.map(_.getString(0))))
  }

  test("chain returns the lexicographically-smallest shortest path (J7)") {
    // diamond: 1→2→4 and 1→3→4, plus a longer 1→5→6→4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val path = graft.operators.GraphOps.chain(edges, 1L, 4L, 5)
      .orderBy($"step").collect().map(_.getLong(1))
    assert(path.toSeq == Seq(1L, 2L, 4L)) // [1,2,4] < [1,3,4]
    // no path within depth
    val longEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L)).toDF("src", "dst")
    assert(graft.operators.GraphOps.chain(longEdges, 1L, 7L, 5).isEmpty)
    assert(graft.operators.GraphOps.chain(longEdges, 1L, 7L, 6)
      .count() == 7) // reachable at exactly 6 hops
    // start == end → empty chain (reference returns [])
    assert(graft.operators.GraphOps.chain(edges, 1L, 1L, 5).isEmpty)
    // cycles don't trap the walk
    val cyc = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val p2 = graft.operators.GraphOps.chain(cyc, 1L, 3L, 5)
      .orderBy($"step").collect().map(_.getLong(1))
    assert(p2.toSeq == Seq(1L, 2L, 3L))
  }
}
