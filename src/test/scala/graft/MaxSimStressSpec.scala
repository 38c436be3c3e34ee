package graft

import graft.tools.Synthetic

/** The MaxSim stress path (VERDICT r3 ask #4): correctness of the
  * synthetic generator + kernel at tiny shape, plan discipline at the
  * bench shape (the ~1 MB patch column must never reach the top-k
  * exchange), and a single full-shape row as the memory canary. */
class MaxSimStressSpec extends SparkSpec {

  test("synthetic maxsim matches a JVM recompute (tiny shape)") {
    val pages = Synthetic.pages(spark, 6, 5, 4)
    val qdf = Synthetic.queryPatches(spark, 3, 4)
    val got = Synthetic.maxsimTopK(pages, qdf, 6)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap

    val q = qdf.collect()(0).getSeq[scala.collection.Seq[Double]](0).map(_.toArray)
    val want = pages.collect().map { r =>
      val d = r.getSeq[scala.collection.Seq[Double]](2).map(_.toArray)
      val score = q.map(qp => d.map(dp =>
        qp.zip(dp).map { case (a, b) => a * b }.sum).max).sum
      ((r.getLong(0), r.getInt(1)), score)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, k) }
  }

  test("stress plan: TakeOrdered moves (id,score) rows, never patches") {
    val df = Synthetic.maxsimTopK(
      Synthetic.pages(spark, 50, 20, 8), Synthetic.queryPatches(spark, 4, 8), 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    val takeLine = p.linesIterator.find(_.contains("TakeOrderedAndProject")).get
    assert(!takeLine.contains("patches"),
      "patch column leaked into the top-k exchange: " + takeLine)
    assert(p.contains("maxsim"), "must use the codegen MaxSim kernel")
    assert(!p.contains("Exchange hashpartitioning"),
      "row-local scoring must not shuffle: " + p.take(1500))
  }

  test("packed f32 layout: same ranking, scores within f32 rounding") {
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions
    val pages = Synthetic.pages(spark, 40, 12, 8)
    val qdf = Synthetic.queryPatches(spark, 4, 8)
    val packed = pages.select(col("document_id"), col("page_number"),
      VectorFunctions.packF32(col("patches"), 8).as("packed"))
    val exact = Synthetic.maxsimTopK(pages, qdf, 40).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val got = Synthetic.maxsimTopKPacked(packed, qdf, 8, 40).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= 1e-5 * (1.0 + math.abs(exact(k))), k)
    }
  }

  test("packed kernel handles short/over-length rows and empty docs") {
    import org.apache.spark.sql.functions.{col, expr}
    import graft.functions.VectorFunctions
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Seq(1.0, 2.0), Seq(3.0))),          // short row zero-pads
      (2L, Seq(Seq(1.0, 2.0, 9.0))),               // long row truncates
      (3L, Seq.empty[Seq[Double]]))                // empty doc → 0.0
      .toDF("id", "patches")
    val q = expr("array(array(1.0d, 1.0d))")
    val out = df.select(col("id"),
        VectorFunctions.maxsimF32(q, VectorFunctions.packF32(col("patches"), 2), 2)
          .as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 3.0) < 1e-6)  // max(1+2, 3+0)
    assert(math.abs(out(2L) - 3.0) < 1e-6)  // 9.0 truncated away
    assert(out(3L) == 0.0)
  }

  test("one full-shape page (1030×128) scores without incident") {
    val row = Synthetic.maxsimTopK(
        Synthetic.pages(spark, 1, 1030, 128),
        Synthetic.queryPatches(spark, 32, 128), 1)
      .collect()
    assert(row.length == 1)
    assert(!row(0).isNullAt(2) && !row(0).getDouble(2).isNaN)
  }
}
