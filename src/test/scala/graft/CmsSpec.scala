package graft

import org.apache.spark.sql.functions._

import graft.operators.Cms

/** Count-Min sketch: never-undercount invariant, additive merge =
  * single-pass sketch, exactness for dominant items at gate
  * dimensions, determinism. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def stream = {
    // known multiset: "hot" 500×, "warm" 50×, 200 singletons
    (Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 200).map(i => s"cold$i")).toDF("v")
  }

  test("estimates never undercount; dominant items are near-exact at d=4,w=1024") {
    val truth = stream.groupBy("v").count()
      .as[(String, Long)].collect().toMap
    val sk = Cms.sketch(stream, $"v")
    val est = Cms.estimate(sk, stream.distinct(), "v")
      .as[(String, Long)].collect().toMap
    for ((item, n) <- truth)
      assert(est(item) >= n, s"$item undercounted: ${est(item)} < $n")
    // 750 items in 4096 registers: collisions add ≤ a few singletons
    assert(est("hot") <= 510 && est("warm") <= 60,
      s"hot=${est("hot")} warm=${est("warm")}")
  }

  test("register-wise merge of split sketches equals the single-pass sketch") {
    val (a, b) = (stream.limit(300), stream.exceptAll(stream.limit(300)))
    val merged = Cms.merge(Cms.sketch(a, $"v"), Cms.sketch(b, $"v"))
      .as[(Int, Long, Long)].collect().toSet
    val direct = Cms.sketch(stream, $"v")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct)
  }

  test("sketch is deterministic and register count is bounded by d·w") {
    val s1 = Cms.sketch(stream, $"v").as[(Int, Long, Long)].collect().toSet
    val s2 = Cms.sketch(stream, $"v").as[(Int, Long, Long)].collect().toSet
    assert(s1 == s2)
    assert(s1.size <= Cms.D * Cms.Wd)
    // every item contributes to exactly D rows
    assert(s1.groupBy(_._1).keySet == (0 until Cms.D).toSet)
  }
}
