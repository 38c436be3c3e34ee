package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curation

/** Bloom-probe decontamination (VERDICT r2 #7): the two-phase
  * bloom-then-exact-confirm variant must produce the identical hit set
  * to the exact broadcast-join check at fpp 1e-6, and the audit shows
  * the bloom pass admits (candidates ≥ true hits) but never fabricates
  * hits. */
class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", TextFunctions.wsTokens(lower($"text")).as("toks"))
  private lazy val evalDocs = base.filter($"doc_id" % 25 === 0)
  private lazy val train = base.filter($"doc_id" % 25 =!= 0).unionByName(
    evalDocs.filter(size($"toks") >= 10)
      .select(($"doc_id" + 1000000).as("doc_id"),
        slice($"toks", lit(1), size($"toks") - 2).as("toks")))

  test("bloom variant returns the identical hit set at fpp 1e-6") {
    val exact = Curation.contamination(train, evalDocs, "doc_id", "toks", 8)
    val bloom = Curation.contaminationBloom(train, evalDocs, "doc_id", "toks", 8,
      fpp = 1e-6)
    assert(exact.count() > 0) // the perturbed copies guarantee hits
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
  }

  test("a sloppy bloom (high fpp) still yields exact results via confirm") {
    // even at fpp 0.5 the confirm pass kills every false positive —
    // the bloom only ever admits extra verification work
    val exact = Curation.contamination(train, evalDocs, "doc_id", "toks", 8)
    val sloppy = Curation.contaminationBloom(train, evalDocs, "doc_id", "toks", 8,
      fpp = 0.5)
    assert(exact.exceptAll(sloppy).isEmpty && sloppy.exceptAll(exact).isEmpty)
  }
}
