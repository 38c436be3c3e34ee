package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnKnn, DenseKnn}

/** Measured ANN quality: recall@10 of both approximate paths against
  * the exact scan, and the effect of Lloyd-refined centroids — the
  * numbers that justify calling these the 100 TB retrieval paths. */
class AnnRecallSpec extends SparkSpec {

  private lazy val e = Tables(spark, sf0001, "embeddings")
  private lazy val queryIds = (0L until 500L by 37L).take(12).toSeq

  private def exactTop(qid: Long, k: Int): Set[Long] = {
    val q = e.filter(col("vec_id") === qid).select(col("embedding"))
    DenseKnn.topK(e, "vec_id", "embedding", q, "embedding", k)
      .collect().map(_.getLong(0)).toSet
  }

  private def recall(approx: Long => Set[Long], k: Int): Double = {
    val rs = queryIds.map { qid =>
      val ex = exactTop(qid, k)
      approx(qid).intersect(ex).size.toDouble / ex.size
    }
    rs.sum / rs.size
  }

  test("LSH recall@10 rises as buckets coarsen; self always found") {
    def lshRecall(tables: Int, bits: Int): Double = {
      val idx = AnnKnn.index(e, "vec_id", "embedding", tables, bits).cache()
      idx.count()
      def lsh(qid: Long): Set[Long] = {
        val q = e.filter(col("vec_id") === qid).select(col("embedding"))
        AnnKnn.topKFromIndex(idx, q, "embedding", 10, tables, bits)
          .collect().map(_.getLong(0)).toSet
      }
      val r = recall(lsh, 10)
      assert(queryIds.forall(q => lsh(q).contains(q)), "self must be a candidate")
      idx.unpersist()
      r
    }
    // the recall/cost knob: halving bits (coarser, bigger buckets) and
    // doubling tables trades candidate volume for recall — on these
    // near-uniform synthetic embeddings (neighbors barely closer than
    // noise, LSH's hardest case) the fine config still lands ~0.3.
    // The coarse config IS the query service's serving default
    // (AnnKnn.ServingTables × ServingBits), so this assertion pins the
    // DEFAULT serving recall at ≥ 0.7 — without even counting the
    // multi-probe lift the serving path adds on top
    val fine = lshRecall(AnnKnn.DefaultTables, AnnKnn.DefaultBits)
    val coarse = lshRecall(AnnKnn.ServingTables, AnnKnn.ServingBits)
    assert(fine >= 0.2, s"fine-config recall@10 = $fine")
    assert(coarse >= 0.7, s"SERVING-default recall@10 = $coarse")
    assert(coarse > fine, s"coarse $coarse should beat fine $fine")
  }

  test("multi-probe lifts store-path recall over single-probe at the same index") {
    import graft.operators.AnnKnn
    import graft.sources.TableStore
    val root = java.nio.file.Files.createTempDirectory("graft_mp").toString
    TableStore.saveAnn(AnnKnn.index(e, "vec_id", "embedding"), root)
    val loaded = TableStore.loadAnn(spark, root).cache()
    loaded.count()
    def qvec(qid: Long): Array[Double] = e.filter(col("vec_id") === qid)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val single = recall(qid =>
      AnnKnn.topKFromStore(loaded, qvec(qid), 10)
        .collect().map(_.getLong(0)).toSet, 10)
    val multi = recall(qid =>
      AnnKnn.topKMultiProbe(loaded, qvec(qid), 10, extraProbes = 3)
        .collect().map(_.getLong(0)).toSet, 10)
    assert(multi > single + 0.05, s"expected a real lift: multi $multi single $single")
    loaded.unpersist()
  }

  test("IVF recall@10: Lloyd-refined centroids not worse than sampled seeds") {
    def ivfRecall(cents: org.apache.spark.sql.DataFrame): Double = {
      val idx = AnnKnn.ivfIndex(e, "vec_id", "embedding", cents).cache()
      idx.count()
      def ivf(qid: Long): Set[Long] = {
        val q = e.filter(col("vec_id") === qid).select(col("embedding"))
        AnnKnn.ivfTopK(idx, cents, q, "embedding", 10, nProbe = 4)
          .collect().map(_.getLong(0)).toSet
      }
      val r = recall(ivf, 10)
      idx.unpersist()
      r
    }
    val sampled = AnnKnn.ivfCentroids(e, "vec_id", "embedding", 19).cache()
    val trained = AnnKnn.kmeansCentroids(e, "vec_id", "embedding", 19, iters = 3).cache()
    assert(trained.count() == sampled.count(), "k must be preserved")
    val rs = ivfRecall(sampled)
    val rt = ivfRecall(trained)
    assert(rs >= 0.4, s"sampled-seed IVF recall@10 = $rs")
    assert(rt >= rs - 0.05, s"trained $rt vs sampled $rs")
  }

  test("kmeans refinement is deterministic (bit-identical across runs)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cid"), transform(col("cvec"), x => round(x, 9)).as("v"))
        .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val a = canon(AnnKnn.kmeansCentroids(e, "vec_id", "embedding", 19, iters = 2))
    val b = canon(AnnKnn.kmeansCentroids(e, "vec_id", "embedding", 19, iters = 2))
    assert(a == b)
  }

  test("coarse quantizer cap binds: k stays fixed as the corpus grows") {
    // without the cap, centroids = n/step turns assignment O(n²)
    // (measured 62× cost at 10× rows in the sf1 rehearsal)
    val capped = AnnKnn.ivfCentroids(e, "vec_id", "embedding", 3, maxK = 4)
    assert(capped.count() == 4)
    // the capped set is the id-ascending prefix, so it is a strict
    // subset of the uncapped quantizer — search stays well-defined
    val ids = capped.select(col("cid")).collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.forall(_ % 3 == 0))
    val top = AnnKnn.ivfTopK(
      AnnKnn.ivfIndex(e, "vec_id", "embedding", capped), capped,
      e.filter(col("vec_id") === 0).select(col("embedding")),
      "embedding", 5, nProbe = 2)
    assert(top.collect().head.getLong(0) == 0L)
  }
}
