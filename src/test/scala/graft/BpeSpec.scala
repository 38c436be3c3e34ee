package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // word histogram: low×3, lower×2, newest×4, widest×1 — the
  // Sennrich-style fixture; merge counts hand-derived in comments
  private def hist = {
    import spark.implicits._
    Seq(("low", 3L), ("lower", 2L), ("newest", 4L), ("widest", 1L))
      .toDF("word", "cnt")
  }

  test("learnMerges: hand-derived argmax sequence with tie-breaks") {
    val m = Bpe.learnMerges(hist, 3)
    // step1: (w,e)=2(lower)+4(newest)=6 is the max pair
    assert(m(0) == Bpe.Merge(1, "w", "e", 6L))
    // step2: (l,o)=5 ties (s,t)=5 -> left asc picks l
    assert(m(1) == Bpe.Merge(2, "l", "o", 5L))
    // step3: (s,t)=5 (newest 4 + widest 1)
    assert(m(2) == Bpe.Merge(3, "s", "t", 5L))
  }

  test("encode: learned merges re-tokenize by priority order") {
    import spark.implicits._
    val merges = Bpe.learnMerges(hist, 3)
    val docs = Seq((1L, "lowest low"), (2L, "Zz9 !!"), (3L, "")).toDF("id", "text")
    val out = Bpe.encode(docs, "id", "text", merges)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // lowest -> lo|we|st (3), low -> lo|w (2)
    assert(out(1L) == ((2L, 5L)))
    // non-alphabetic words are excluded from the stream entirely
    assert(out(2L) == ((0L, 0L)))
    assert(out(3L) == ((0L, 0L)))
  }

  test("training is deterministic across reruns") {
    val a = Bpe.learnMerges(hist, 3)
    val b = Bpe.learnMerges(hist, 3)
    assert(a == b)
  }

  // r15 optimization: the merge loop went driver-local with chunked
  // parallel pair counting — pin it against a naive single-threaded
  // reference on a histogram large enough to split into many chunks
  test("local merge loop: chunked parallel counting ≡ naive reference") {
    val rnd = new scala.util.Random(42)
    val types = Array.tabulate(5000) { i =>
      val w = (0 until 3 + rnd.nextInt(6))
        .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      (Bpe.Sep + w.map(c => s"$c${Bpe.Sep}").mkString, 1L + rnd.nextInt(9))
    }
    def naive(ts: Array[(String, Long)], n: Int): Seq[Bpe.Merge] = {
      var h = ts
      val out = Seq.newBuilder[Bpe.Merge]
      for (step <- 1 to n) {
        val m = scala.collection.mutable.HashMap[(String, String), Long]()
        for ((ws, cnt) <- h) {
          val toks = ws.split(Bpe.Sep).filter(_.nonEmpty)
          for (i <- 0 until toks.length - 1)
            m.update((toks(i), toks(i + 1)),
              m.getOrElse((toks(i), toks(i + 1)), 0L) + cnt)
        }
        if (m.nonEmpty) {
          val ((l, r), c) = m.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += Bpe.Merge(step, l, r, c)
          h = h.map { case (ws, cnt) =>
            (ws.replace(Bpe.Sep + l + Bpe.Sep + r + Bpe.Sep,
              Bpe.Sep + l + r + Bpe.Sep), cnt)
          }
        }
      }
      out.result()
    }
    assert(Bpe.learnMergesLocal(types.clone(), 12) == naive(types, 12))
  }
}
