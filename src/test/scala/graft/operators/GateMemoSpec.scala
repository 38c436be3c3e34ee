package graft.operators

import graft.{SparkSpec, TestSpark}

/** The trained-artifact memo fence: a corpus whose (mtime, length)
  * stamp cannot be read must NEVER be served from (or stored into) the
  * memo — VERDICT r13 hygiene #1: two consecutive stamp failures
  * around an in-place regeneration would otherwise reuse a stale
  * trained artifact keyed on the bare path. */
class GateMemoSpec extends SparkSpec {

  test("stampable corpus gets a stamped key; stamp failure gets None") {
    val k = GateMemo.corpusKey(spark, sf0001)
    assert(k.exists(_.startsWith(s"$sf0001@")), s"expected stamped key, got $k")
    assert(k.exists(s => s.contains(":") && s.contains("@")))
    assert(GateMemo.corpusKey(spark, "/nonexistent/graft_no_such_dir").isEmpty)
  }

  test("stamp-failure path never serves or stores a memoized artifact") {
    // drive the consumer gates against a missing corpus dir: both must
    // fail while ATTEMPTING the retrain (reading the absent table), not
    // succeed via a memo hit — and nothing may have been memoized under
    // any key derivable from the bad path
    val bad = "/nonexistent/graft_no_such_dir"
    intercept[Throwable] { Bpe.encodeGate(spark, bad).collect() }
    intercept[Throwable] { Bpe.encodeGate(spark, bad).collect() } // still no memo
    intercept[Throwable] { Classifier.scoreGate(spark, bad).collect() }
    intercept[Throwable] { Classifier.scoreGate(spark, bad).collect() }
  }
}
