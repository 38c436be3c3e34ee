package graft

import org.apache.spark.sql.functions._

import graft.operators.{DenseKnn, Hnsw, HnswServing, HnswShard}

/** Sharded HNSW ANN: exact-recall parity at full-beam settings,
  * build determinism, degree invariants, and the parquet round-trip
  * of the one-row-per-shard store layout. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf0001, "embeddings")
  private lazy val qvec: Array[Double] = emb.filter($"vec_id" === 0)
    .select($"embedding".cast("array<double>")).collect()
    .head.getSeq[Double](0).toArray

  test("topK at serving ef matches the exact brute-force scan") {
    val idx = Hnsw.build(emb, "vec_id", "embedding", shards = 4)
    val got = Hnsw.topK(idx, qvec, 20, ef = Hnsw.DefaultEfSearch)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q = emb.filter($"vec_id" === 0).select($"embedding")
    val want = DenseKnn.topK(emb, "vec_id", "embedding", q, "embedding", 20)
      .select($"id", $"score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("recall@10 stays high at a small beam") {
    val idx = Hnsw.build(emb, "vec_id", "embedding", shards = 4)
    val got = Hnsw.topK(idx, qvec, 10, ef = 24).collect().map(_.getLong(0)).toSet
    val q = emb.filter($"vec_id" === 0).select($"embedding")
    val want = DenseKnn.topK(emb, "vec_id", "embedding", q, "embedding", 10)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert((got & want).size >= 9, s"recall ${(got & want).size}/10")
  }

  test("build is deterministic and respects the degree bound") {
    def shards(): Map[Int, HnswShard] =
      Hnsw.build(emb, "vec_id", "embedding", shards = 4)
        .collect().map(s => s.pid -> s).toMap
    val a = shards()
    val b = shards()
    assert(a.keySet == Set(0, 1, 2, 3))
    a.keySet.foreach { pid =>
      assert(a(pid).ids.toSeq == b(pid).ids.toSeq)
      assert(a(pid).adj == b(pid).adj)
      assert(a(pid).entry == b(pid).entry)
      assert(a(pid).vecs.toSeq == b(pid).vecs.toSeq)
      // degree caps: 2m at layer 0, m above; entry has the max level
      val s = a(pid)
      s.adj.zipWithIndex.foreach { case (layers, node) =>
        layers.zipWithIndex.foreach { case (nbrs, layer) =>
          val cap = if (layer == 0) 2 * Hnsw.DefaultM else Hnsw.DefaultM
          assert(nbrs.size <= cap, s"node $node layer $layer degree ${nbrs.size}")
          // edges connect within the shard and never self-loop
          nbrs.foreach(nb => assert(nb != node && nb >= 0 && nb < s.ids.length))
        }
      }
      assert(s.levels(s.entry) == s.levels.max)
    }
  }

  test("one-row-per-shard parquet round-trip preserves results") {
    val idx = Hnsw.build(emb, "vec_id", "embedding", shards = 4)
    val tmp = graft.operators.TmpDirs.create("graft_hnsw_store")
    idx.write.mode("overwrite").parquet(tmp)
    val loaded = spark.read.parquet(tmp).as[HnswShard]
    val got = Hnsw.topK(loaded, qvec, 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val direct = Hnsw.topK(idx, qvec, 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == direct.toSeq)
  }

  test("serving layer: recall@10 at the serving config, tenant-pruned scan") {
    // string ids + two tenants, sharded per (org, hash) — the serving
    // store shape QueryService writes. Recall is measured against the
    // per-tenant exact scan at the DEFAULT serving beam (ef=128).
    val sEmb = emb.select(
      concat(lit("org_"), (pmod($"vec_id", lit(2))).cast("string"),
        lit("::doc_"), $"vec_id".cast("string")).as("id"),
      $"embedding",
      concat(lit("org_"), pmod($"vec_id", lit(2)).cast("string"))
        .as("organization_id"))
    val idx = Hnsw.buildServing(sEmb, "id", "embedding", "organization_id",
      shards = Hnsw.shardsFor(sEmb.count()))
    val tmp = graft.operators.TmpDirs.create("graft_hnsw_serving")
    idx.write.mode("overwrite").partitionBy("organization_id").parquet(tmp)
    val loaded = spark.read.parquet(tmp).as[HnswServing]
      .filter($"organization_id" === "org_1")

    val got = Hnsw.servingCandidates(loaded, qvec, ef = Hnsw.DefaultEfSearch)
      .orderBy($"score".desc, $"id").limit(10)
      .collect().map(_.getString(0)).toSet
    val want = DenseKnn.topK(
        sEmb.filter($"organization_id" === "org_1"), "id", "embedding",
        emb.filter($"vec_id" === 0).select($"embedding"), "embedding", 10)
      .collect().map(_.getString(0)).toSet
    assert(got.forall(_.startsWith("org_1::")), "tenant leak in candidates")
    assert((got & want).size >= 9, s"serving recall ${(got & want).size}/10")
  }
}
