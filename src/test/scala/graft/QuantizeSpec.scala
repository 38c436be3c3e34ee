package graft

import org.apache.spark.sql.functions._

import graft.operators.{DenseKnn, Quantize}

/** Int8 quantization: per-element error bound and retrieval quality
  * against the exact dot-product path. */
class QuantizeSpec extends SparkSpec {

  test("dequantized values stay within half a quantization step") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val qz = Quantize.quantized(e, "vec_id", "embedding")
      .join(e.select($"vec_id".as("id"),
        $"embedding".cast("array<double>").as("v")), Seq("id"))
    // |code/127*scale - v| <= scale/254 (floor(x+0.5) = nearest)
    val err = qz.select(
      aggregate(
        zip_with($"codes", $"v",
          (c, v) => abs(c / 127.0 * $"scale" - v)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"),
      ($"scale" / 254.0 + lit(1e-12)).as("bound"))
    assert(err.filter($"max_err" > $"bound").isEmpty)
  }

  test("codes are integers in [-127, 127]") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val bad = Quantize.quantized(e, "vec_id", "embedding")
      .select(explode($"codes").as("c"))
      .filter($"c" =!= floor($"c") || abs($"c") > 127)
    assert(bad.isEmpty)
  }

  test("tinyint store round-trips codes exactly and shrinks the files") {
    import spark.implicits._
    import graft.operators.TmpDirs
    import graft.sources.TableStore
    val root = TmpDirs.create("graft_quant")
    val e = Tables(spark, sf0001, "embeddings")
    TableStore.saveQuantized(e, "vec_id", "embedding", root)
    val loaded = TableStore.loadQuantized(spark, root)
    // round-trip: loaded codes equal the in-flight quantization
    val fresh = Quantize.quantized(e, "vec_id", "embedding")
    assert(loaded.except(fresh).isEmpty && fresh.except(loaded).isEmpty)
    // 4x claim: quantized parquet is well under half the raw column's size
    def dirSize(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        else f.length
      walk(new java.io.File(p))
    }
    val rawDir = root + "/raw"
    e.select($"vec_id", $"embedding").write.parquet(rawDir)
    val ratio = dirSize(root + "/quantized").toDouble / dirSize(rawDir)
    assert(ratio < 0.55, s"quantized/raw size ratio = $ratio")
  }

  test("quantized top-10 recall vs exact is >= 0.8") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings")
    val q = e.filter($"vec_id" === 0).select($"embedding")
    val exact = DenseKnn.topK(e, "vec_id", "embedding", q, "embedding", 10)
      .select($"id").as[Long].collect().toSet
    val quant = Quantize.topKQuantized(e, "vec_id", "embedding", 0L, 10)
      .select($"id").as[Long].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }

  test("randomProject: deterministic, and JL-preserves pairwise distances") {
    import spark.implicits._
    val e = Tables(spark, sf0001, "embeddings").limit(40).cache()
    val p = Quantize.randomProject(e, "vec_id", "embedding", 16)
    val a = p.orderBy("id", "dim_j").collect().toSeq
    assert(a == Quantize.randomProject(e, "vec_id", "embedding", 16)
      .orderBy("id", "dim_j").collect().toSeq)
    assert(a.size == 40 * 16)
    // JL property at 16 dims: squared-distance ratios concentrate
    // around 1 — check the median ratio lands in a generous band
    // (distortion bounds are probabilistic, the MEDIAN is stable)
    val orig = e.select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val proj = a.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray).toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      o = d2(orig(ids(i)), orig(ids(j))) if o > 1e-9
    } yield d2(proj(ids(i)).toSeq, proj(ids(j)).toSeq) / o
    val med = ratios.sorted.apply(ratios.size / 2)
    assert(med > 0.5 && med < 1.5, s"median distance ratio = $med")
  }
}
