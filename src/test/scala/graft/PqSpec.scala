package graft

import org.apache.spark.sql.functions._

import graft.functions.{Pq, PqFunctions, VectorFunctions}
import graft.operators.{AnnKnn, PqKnn}
import graft.sources.TableStore

/** Product-quantization kernels + the IVF-PQ read path. */
class PqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001, "embeddings")
  private lazy val cb = PqKnn.sampledCodebook(emb, "vec_id", "embedding",
    m = 8, k = 4, step = 7)
  private lazy val query = PqKnn.queryVec(emb, "vec_id", "embedding", 0L)

  test("column encode matches the JVM twin on every corpus vector") {
    val colCodes = PqKnn.encoded(emb, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val jvmCodes = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) ->
        Pq.encodeJvm(r.getSeq[Double](1).toArray, cb.flat, cb.m, cb.sub, cb.k))
      .toMap
    assert(colCodes.keySet == jvmCodes.keySet)
    for ((id, c) <- colCodes)
      assert(c.sameElements(jvmCodes(id)), s"codes diverge for id $id")
    // codes are valid pids
    assert(colCodes.values.forall(_.forall(p => p >= 0 && p < cb.k)))
  }

  test("adc column scores match a driver-side lut replay") {
    val lut = Pq.lutJvm(query, cb.flat, cb.m, cb.sub, cb.k)
    val enc = PqKnn.encoded(emb, "vec_id", "embedding", cb)
    val colScores = PqKnn.adcScores(enc, query, cb)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val replay = enc.collect().map { r =>
      val codes = r.getSeq[Int](1)
      var s = 0.0
      for (j <- codes.indices) s += lut(j * cb.k + codes(j))
      r.getLong(0) -> VectorFunctions.round6Jvm(s)
    }.toMap
    assert(colScores == replay)
  }

  test("pq store round-trip: codes and codebook are lossless") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq_rt").toString
    val cents = AnnKnn.ivfCentroids(emb, "vec_id", "embedding", 13)
    val idx = PqKnn.ivfPqIndex(emb, "vec_id", "embedding", cents, cb)
    TableStore.savePq(idx, cb, root)
    val (loaded, cb2) = TableStore.loadPq(spark, root)
    assert(cb2.m == cb.m && cb2.sub == cb.sub && cb2.k == cb.k)
    assert(cb2.flat.sameElements(cb.flat))
    val before = idx.select(col("id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val after = loaded.select(col("id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(before == after)
    // k=4 codes fit a tinyint with room to spare; the parquet schema
    // must actually be tinyint (the 8x storage point of the layout)
    val schema = spark.read.parquet(s"$root/pq").schema("codes").dataType
    assert(schema.simpleString == "array<tinyint>", schema.simpleString)
  }

  test("refine rescoring equals exact scores on the candidate set") {
    val enc = PqKnn.encoded(emb, "vec_id", "embedding", cb)
    val cands = PqKnn.adcTopK(enc, query, cb, 30)
    val raw = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val refined = PqKnn.refineTopK(cands, raw, query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // exact brute-force scores restricted to the candidate ids, top 10
    val candIds = cands.select("id").collect().map(_.getLong(0)).toSet
    val exact = raw.filter(col("id").isInCollection(candIds))
      .select(col("id"),
        round(VectorFunctions.dot(col("vec"), typedLit(query.toSeq)), 6).as("s"))
      .orderBy(col("s").desc, col("id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.toSeq == exact.toSeq)
  }

  test("ivf-pq top-k: query finds itself; results are exact-scored") {
    val cents = AnnKnn.ivfCentroids(emb, "vec_id", "embedding", 13)
    val idx = PqKnn.ivfPqIndex(emb, "vec_id", "embedding", cents, cb)
    val raw = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val top = PqKnn.ivfPqTopK(idx, cents, raw, query, cb, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // unit-norm corpus: the query's own vector must surface with
    // score 1.0 (its list is always the best probe)
    assert(top.head == ((0L, 1.0)), top.toSeq)
    // every returned score is the exact dot, not the ADC estimate
    val exact = raw
      .select(col("id"),
        round(VectorFunctions.dot(col("vec"), typedLit(query.toSeq)), 6).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top.forall { case (id, s) => exact(id) == s }, top.toSeq)
  }

  test("production k=256 codebook: byte-code round-trip, recall ≥ k=16, codegen") {
    // the serving-store config (VERDICT r4 ask #4): hash-sampled 256
    // entries per subspace + one Lloyd round, full byte-code range
    val cb256 = PqKnn.refineCodebook(emb, "embedding",
      PqKnn.codebookFrom(PqKnn.hashSampledRows(emb, "vec_id", "embedding", 256)),
      iters = 1)
    assert(cb256.k > 128, s"need byte-range pids, got k=${cb256.k}")

    // offset-binary storage: pids ≥ 128 must survive the SIGNED
    // tinyint round-trip (a plain cast silently wraps them)
    val cents = AnnKnn.ivfCentroids(emb, "vec_id", "embedding", 13)
    val idx = PqKnn.ivfPqIndex(emb, "vec_id", "embedding", cents, cb256)
    assert(idx.select(explode(col("codes")).as("p"))
      .filter(col("p") >= 128).count() > 0, "fixture never exercises high pids")
    val root = java.nio.file.Files.createTempDirectory("graft_pq256").toString
    TableStore.savePq(idx, cb256, root)
    val (loaded, cbL) = TableStore.loadPq(spark, root)
    assert(cbL.k == cb256.k && cbL.flat.sameElements(cb256.flat))
    val before = idx.select(col("id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val after = loaded.select(col("id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(before == after)
    assert(spark.read.parquet(s"$root/pq").schema("codes").dataType.simpleString
      == "array<tinyint>")

    // compressed-domain recall@10 vs the exact scan: the byte codebook
    // must not be worse than the gate-scale k=16 sampled config
    val raw = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val qids = (0L until 500L by 53L).take(8)
    def recall(c: PqKnn.Codebook): Double = {
      val enc = PqKnn.encoded(emb, "vec_id", "embedding", c).cache()
      enc.count()
      val r = qids.map { qid =>
        val q = PqKnn.queryVec(emb, "vec_id", "embedding", qid)
        val adc = PqKnn.adcTopK(enc, q, c, 10).collect().map(_.getLong(0)).toSet
        val exact = raw.select(col("id"),
            round(VectorFunctions.dot(col("vec"), typedLit(q.toSeq)), 6).as("s"))
          .orderBy(col("s").desc, col("id")).limit(10)
          .collect().map(_.getLong(0)).toSet
        adc.intersect(exact).size.toDouble / exact.size
      }.sum / qids.size
      enc.unpersist()
      r
    }
    val cb16 = PqKnn.sampledCodebook(emb, "vec_id", "embedding")
    val r256 = recall(cb256)
    val r16 = recall(cb16)
    assert(r256 >= r16 - 1e-9, s"k=256 recall $r256 < k=16 recall $r16")

    // no codegen fallback at the production shape: the 2048-entry lut
    // rides as ONE literal, so ADC scoring stays whole-stage-codegen'd
    val p = PqKnn.adcScores(
        PqKnn.encoded(emb, "vec_id", "embedding", cb256), query, cb256)
      .queryExecution.executedPlan.toString
    // the star prefix marks operators INSIDE a WholeStageCodegen span;
    // a codegen fallback would print an unstarred Project
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("refined codebook does not increase quantization distortion") {
    def distortion(c: PqKnn.Codebook): Double =
      emb.select(col("embedding").cast("array<double>").as("v"))
        .collect().map { r =>
          val v = r.getSeq[Double](0).toArray
          val codes = Pq.encodeJvm(v, c.flat, c.m, c.sub, c.k)
          (0 until c.m).map { j =>
            val base = (j * c.k + codes(j)) * c.sub
            (0 until c.sub).map { i =>
              val d = v(j * c.sub + i) - c.flat(base + i); d * d
            }.sum
          }.sum
        }.sum
    val refined = PqKnn.refinedCodebook(emb, "vec_id", "embedding",
      m = 8, k = 4, step = 7, iters = 2)
    val d0 = distortion(cb)
    val d1 = distortion(refined)
    assert(d1 <= d0 + 1e-9, s"refined distortion $d1 > sampled $d0")
    // and refinement is deterministic: a second run is bit-identical
    val refined2 = PqKnn.refinedCodebook(emb, "vec_id", "embedding",
      m = 8, k = 4, step = 7, iters = 2)
    assert(refined.flat.sameElements(refined2.flat))
  }
}
