package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** HyperLogLog sketch: estimator accuracy against exact counts at the
  * paper's error envelope, register-wise merge = direct sketch, both
  * estimator branches exercised, determinism. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimates track exact distincts within the m=64 error envelope") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"source", $"text")
    val sk = Hll.sketch(docs, $"source", $"text").cache()
    val est = Hll.estimate(sk.union(Hll.merge(sk, "__all__")))
      .as[(String, Double)].collect().toMap
    val exact = docs.groupBy("source").agg(countDistinct($"text").as("d"))
      .as[(String, Long)].collect().toMap +
      ("__all__" -> docs.select($"text").distinct().count())
    sk.unpersist(false)
    assert(est.keySet == exact.keySet)
    for ((g, e) <- exact) {
      val rel = math.abs(est(g) - e) / math.max(e.toDouble, 1.0)
      // rse at m=64 is 1.04/sqrt(64) ≈ 13%; allow 4 sigma
      assert(rel <= 0.52, s"$g: est=${est(g)} exact=$e rel=$rel")
    }
  }

  test("merged per-source sketches equal the direct global sketch") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"source", $"text")
    val perSource = Hll.sketch(docs, $"source", $"text")
    val merged = Hll.merge(perSource, "g")
      .select($"bucket", $"mj").as[(Long, Int)].collect().toMap
    val direct = Hll.sketch(docs, lit("g"), $"text")
      .select($"bucket", $"mj").as[(Long, Int)].collect().toMap
    assert(merged == direct)
  }

  test("both estimator branches fire and are deterministic") {
    // 5 distinct values in one group → linear counting;
    // 500 in another → raw harmonic (raw > 2.5m = 160)
    val docs = ((1 to 5).map(i => ("small", s"v$i")) ++
      (1 to 500).map(i => ("big", s"w$i"))).toDF("g", "v")
    val sk = Hll.sketch(docs, $"g", $"v")
    val est = Hll.estimate(sk).as[(String, Double)].collect().toMap
    assert(est("small") >= 3 && est("small") <= 8, est("small"))
    assert(est("big") >= 300 && est("big") <= 750, est("big"))
    val est2 = Hll.estimate(Hll.sketch(docs, $"g", $"v"))
      .as[(String, Double)].collect().toMap
    assert(est == est2)
  }
}
