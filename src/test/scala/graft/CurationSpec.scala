package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, TextPack}

/** Training-data curation: decontamination, repetition signals,
  * deterministic stratified sampling, and the hot-shingle df cap on
  * the inverted-index jaccard. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), TextFunctions.wsTokens(lower(col("text"))).as("toks"))

  test("contamination flags exactly the docs sharing an eval n-gram") {
    val train = toks(Seq(
      (1L, "a b c d e f g h i j"),     // contains eval 8-gram a..h
      (2L, "z y x w v u t s r q"),     // disjoint
      (3L, "k a b c d e f g h m")      // eval 8-gram shifted inside
    ).toDF("id", "text"))
    val ev = toks(Seq((99L, "a b c d e f g h")).toDF("id", "text"))
    val out = Curation.contamination(train, ev, "id", "toks", 8)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // doc 1: 3 distinct 8-grams, 1 hit; doc 3: 3 distinct, 1 hit
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (1L, 3L)))
  }

  test("repetition signals: hand-checked fractions") {
    val d = Seq((1L, "a b a b"), (2L, "p q r s"), (3L, "solo")).toDF("id", "text")
    val out = Curation.repetitionSignals(toks(d), "id", "toks")
      .orderBy("id").collect()
    // doc 3 has < 2 tokens -> excluded
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // "a b a b": bigrams [a b, b a, a b] -> total 3, distinct 2, top 2
    val r1 = out(0)
    assert(r1.getLong(1) == 3L)
    assert(r1.getDouble(2) == 0.333333)
    assert(r1.getDouble(3) == 0.666667)
    // all-distinct doc: dup 0, top 1/3
    val r2 = out(1)
    assert(r2.getDouble(2) == 0.0)
    assert(r2.getDouble(3) == 0.333333)
  }

  test("stratified sample is deterministic and tracks per-stratum rates") {
    val docs = spark.range(0, 2000)
      .select(col("id"), (col("id") % 2).cast("string").as("s"))
    val rates = Map("0" -> 0.5, "1" -> 0.1)
    val a = Curation.stratifiedSample(docs, "id", "s", rates, 0.0, "t1")
    val b = Curation.stratifiedSample(docs, "id", "s", rates, 0.0, "t1")
    // bit-deterministic across runs
    assert(a.collect().map(_.getLong(0)).sorted.toSeq ==
      b.collect().map(_.getLong(0)).sorted.toSeq)
    val byStratum = a.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 per stratum; hash-uniform within ±~10%
    assert(math.abs(byStratum("0") - 500L) < 60, byStratum.toString)
    assert(math.abs(byStratum("1") - 100L) < 40, byStratum.toString)
    // a different salt draws a different sample
    val c = Curation.stratifiedSample(docs, "id", "s", rates, 0.0, "t2")
    assert(c.collect().map(_.getLong(0)).sorted.toSeq !=
      a.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("packShards: two-phase distributed prefix == single-window prefix") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.range(0, 500)
      .select(col("id"), (col("id") % 3).cast("string").as("s"),
        ((col("id") * 37 % 91) + 5).as("n"))
    val packed = Curation.packShards(docs, "id", "s", "n", budget = 300L,
      groupSize = 50L)
    val w = Window.partitionBy("s").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.select(col("id"),
      floor((sum(col("n")).over(w) - col("n")) / lit(300L)).as("shard_id"))
    val got = packed.select("id", "shard_id").orderBy("id").collect().toSeq
    assert(got == ref.orderBy("id").collect().toSeq)
    // shards fill contiguously: within a stratum, shard ids are
    // non-decreasing in id and start at 0
    val perStratum = packed.orderBy("id").collect()
      .groupBy(_.getString(1)).values
    perStratum.foreach { rows =>
      val ids = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(ids.head == 0L)
      assert(ids.zip(ids.tail).forall { case (a, b) => b >= a })
    }

    // null strata must survive the internal offset join (a null-unsafe
    // equi-join would silently drop every null-stratum doc)
    val withNull = spark.range(0, 100)
      .select(col("id"),
        when(col("id") % 2 === 0, "s").otherwise(lit(null)).as("s"),
        lit(1L).as("n"))
    assert(Curation.packShards(withNull, "id", "s", "n", 30L, 20L).count() == 100)
  }

  test("approx quantiles track exact quantiles") {
    val docs = spark.range(0, 2000)
      .select((col("id") % 4).cast("string").as("s"), (col("id") % 211).as("n"))
    val exact = Curation.tokenQuantiles(docs, "s", "n", Seq(0.5, 0.9))
      .orderBy("stratum").collect()
    val approx = Curation.approxTokenQuantiles(docs, "s", "n", Seq(0.5, 0.9))
      .orderBy("stratum").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e.getDouble(1) - a.getLong(1)) <= 3.0, (e, a).toString)
      assert(math.abs(e.getDouble(2) - a.getLong(2)) <= 3.0, (e, a).toString)
    }
  }

  test("leakageFreeSplit: whole clusters on one side, fractions track evalFrac") {
    val docs = spark.range(0, 1000).select(col("id"))
    // clusters of 3: {0,1,2} -> 0, {3,4,5} -> 3, … for the first 600 ids
    val labels = spark.range(0, 600)
      .select(col("id"), (col("id") - col("id") % 3).as("cluster"))
    val out = Curation.leakageFreeSplit(docs, "id", labels, 0.25, "sp1")
      .select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 1000)
    // every cluster is entirely train or entirely eval
    (0L until 600L by 3L).foreach { c =>
      assert(Set(out(c), out(c + 1), out(c + 2)).size == 1, s"cluster $c split")
    }
    // fraction ~25% (hash-uniform over ~200 clusters + 400 singletons)
    val evalN = out.values.count(_ == "eval")
    assert(evalN > 150 && evalN < 350, s"evalN=$evalN")
    // deterministic
    val again = Curation.leakageFreeSplit(docs, "id", labels, 0.25, "sp1")
      .select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("delta LSH candidates: new-vs-corpus pairs only, near-dup found") {
    val corpus = toks(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red orange yellow green blue indigo violet purple")
    ).toDF("id", "text"))
    // doc 10 is a near-copy of corpus doc 1; 11 is novel; 12 is a
    // near-copy of 10 ARRIVING IN THE SAME BATCH (the intra-batch
    // pair the corpus bands cannot surface)
    val delta = toks(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta iota"),
      (11L, "completely different words appear in this new document"),
      (12L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("id", "text"))
    val k = TextPack.MinhashK
    val corpusBands = Dedup.bandTable(
      Dedup.minhashSignatures(corpus, "id", "toks", k),
      TextPack.Bands, TextPack.Rows)
    val cands = Dedup.lshCandidatesDelta(
        Dedup.minhashSignatures(delta, "id", "toks", k),
        corpusBands, TextPack.Bands, TextPack.Rows)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((10L, 1L)), cands.toString)
    assert(cands.contains((12L, 1L)), cands.toString)
    assert(cands.contains((10L, 12L)), s"intra-batch pair missed: $cands")
    // every pair involves a delta doc on the left
    assert(cands.forall { case (a, _) => a >= 10L }, cands.toString)
    // novel doc 11 matches nothing
    assert(cands.forall { case (a, b) => a != 11L && b != 11L }, cands.toString)
  }

  test("keepCanonical drops exactly the non-canonical cluster members") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // clusters: {1,2,3} canonical 1, {4} not in any pair, 5 untouched
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val kept = Dedup.keepCanonical(docs, "id", labels)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("interleaveByWeight: prefix rates proportional to weights") {
    val docs = spark.range(0, 200)
      .select(col("id"), when(col("id") < 100, "a").otherwise("b").as("src"))
    val mixed = Curation.interleaveByWeight(docs, "id", "src",
        Map("a" -> 2.0), defaultWeight = 1.0)
      .orderBy("mix_pos", "id").limit(30).collect()
    val bySrc = mixed.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // weight 2:1 ⇒ the first 30 mixture positions hold 20 a's and 10 b's
    assert(bySrc == Map("a" -> 20, "b" -> 10), bySrc.toString)
    // and within a source the original id order is preserved
    val aIds = mixed.filter(_.getString(1) == "a").map(_.getLong(0)).toSeq
    assert(aIds == aIds.sorted)
  }

  test("jaccardBlocked df cap: identical pairs without hot shingles; bounded fan-out") {
    // docs 1/2 are near-dups; every doc shares the boilerplate prefix
    // "x y z" whose shingle appears in all 4 docs
    val d = Seq(
      (1L, "x y z a b c d e"),
      (2L, "x y z a b c d f"),
      (3L, "x y z p q r s t"),
      (4L, "x y z g h i j k")
    ).toDF("id", "text")
    val corpus = toks(d).withColumn("blk", lit("one"))
    val exact = Dedup.jaccardBlocked(corpus, "id", "toks", "blk", 0.05)
      .orderBy("id_a", "id_b").collect()
    val capped = Dedup.jaccardBlocked(corpus, "id", "toks", "blk", 0.05, maxDf = 3)
      .orderBy("id_a", "id_b").collect()
    // the (1,2) near-dup survives the cap with a (lower-bound) score;
    // pairs held together ONLY by the hot "x y z" shingle drop out
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 3L)))
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // capped score <= exact score for the surviving pair
    val je = exact.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    val jc = capped.head.getDouble(2)
    assert(jc <= je)
  }

  test("packSequences: spans tile every sequence and partition every doc") {
    // doc lengths straddle the 10-token seqLen: 3+4 pack into seq 0,
    // the 17-token doc spans seqs 0..2, a zero-token doc vanishes
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 17L), (4L, 0L), (5L, 6L))
      .toDF("id", "n")
    val out = Curation.packSequences(docs, "id", "n", seqLen = 10L,
      groupSize = 2L).collect()
    assert(!out.map(_.getAs[Long]("id")).contains(4L))
    // per-doc spans sum to the doc's length and chain doc_from
    val byDoc = out.groupBy(_.getAs[Long]("id"))
    assert(byDoc(3L).map(_.getAs[Long]("len")).sum == 17L)
    assert(byDoc(3L).map(_.getAs[Long]("seq_id")).sorted.toSeq == Seq(0L, 1L, 2L))
    // every sequence except the last is exactly full
    val bySeq = out.groupBy(_.getAs[Long]("seq_id")).view
      .mapValues(_.map(_.getAs[Long]("len")).sum).toMap
    val last = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != last) assert(tot == 10L, s"seq $s holds $tot tokens")
    }
    // total tokens conserved: 3+4+17+6 = 30
    assert(out.map(_.getAs[Long]("len")).sum == 30L)
    // within a sequence, spans tile [0, len) without gaps
    out.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, rows) =>
      val spans = rows.map(r => (r.getAs[Long]("seq_from"), r.getAs[Long]("len")))
        .sortBy(_._1)
      spans.foldLeft(0L) { case (cursor, (from, len)) =>
        assert(from == cursor); from + len
      }
    }
  }

  test("gopherRules: each rule fires on its designed violation") {
    val good = ("the quick brown fox jumps over the lazy dog and then " +
      "rests with a that have be to of friend nearby for a while longer " +
      "until evening comes and everyone goes home to sleep soundly " +
      "through the night before waking early with renewed energy for work " +
      "on the next bright morning ahead of them all") // > 50 words, prose
    val rows = Seq(
      (1L, good),
      (2L, "short doc"),                                     // word count < 50
      (3L, ("## # # # # # # # # # # # # " * 10) + good),     // symbol ratio > 0.1
      (4L, (1 to 12).map(i => s"- bullet item $i").mkString("\n")), // bullets
      (5L, (1 to 10).map(i => s"trailing line $i...").mkString("\n")), // ellipses
      (6L, good.split(" ").map(w => w + " 123 456 789").mkString(" ")), // alpha < 0.8
      (7L, Seq.fill(60)("lorem ipsum dolor sit amet").mkString(" "))    // no stopwords
    ).toDF("id", "text")
    val out = Curation.gopherRules(rows, "id", "text")
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("keep") && byId(2L).getAs[Long]("n_words") == 2L)
    assert(!byId(3L).getAs[Boolean]("keep") &&
      byId(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!byId(4L).getAs[Boolean]("keep") &&
      byId(4L).getAs[Double]("bullet_frac") == 1.0)
    assert(!byId(5L).getAs[Boolean]("keep") &&
      byId(5L).getAs[Double]("ellipsis_frac") == 1.0)
    assert(!byId(6L).getAs[Boolean]("keep") &&
      byId(6L).getAs[Double]("alpha_frac") < 0.8)
    assert(!byId(7L).getAs[Boolean]("keep") && byId(7L).getAs[Long]("stop_hits") < 2)
    // empty text: all-zero metrics, keep = false, no NaN/null leakage
    val empty = Curation.gopherRules(Seq((9L, "")).toDF("id", "text"), "id", "text")
      .collect().head
    assert(!empty.getAs[Boolean]("keep") && empty.getAs[Double]("mean_word_len") == 0.0)
  }

  test("semDedup: removes the non-canonical member of every ε-group") {
    // two identical pairs in orthogonal directions: whatever vectors
    // the hash-sample picks as centroids, each pair shares a cluster
    // (identical vectors score identically, ties break identically),
    // so exactly the min-id member of each pair survives
    val e = Seq(
      (1L, Seq(1.0, 0.01, 0.0)), (2L, Seq(1.0, 0.01, 0.0)),
      (5L, Seq(0.0, 1.0, 0.01)), (6L, Seq(0.0, 1.0, 0.01))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedup(e, "vec_id", "embedding", k = 2, eps = 0.95)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L, 6L))
    val keep = out.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    assert(keep == Set(1L, 5L))
    // cluster ids come from the k-row hash sample
    assert(out.forall(r => { val c = r.getAs[Long]("cluster_id"); c >= 1 && c <= 2 }))
    // orthogonal groups are never ε-similar even inside one cluster
    val out1 = Dedup.semDedup(e, "vec_id", "embedding", k = 1, eps = 0.95)
      .collect().filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
    assert(out1 == Set(1L, 5L)) // single cluster: same survivors
  }

  test("sourceReputation: per-source verdicts and the broadcast filter-back") {
    val docs = Seq(
      // good: long varied prose, no dups
      (1L, "The quarterly revenue review covers supplier contracts, renewal terms, and the updated payment schedule for each region.", "good"),
      (2L, "Operations notes describe warehouse throughput, staffing levels, and seasonal demand planning across distribution centers.", "good"),
      // junk: digit soup (low alpha ratio, low length)
      (3L, "000 111 222 333 444", "junk"),
      (4L, "99999 88888 77777", "junk"),
      // dupfarm: fine text but every doc identical
      (5L, "A perfectly reasonable paragraph that appears many times verbatim across this particular source's documents.", "dupfarm"),
      (6L, "A perfectly reasonable paragraph that appears many times verbatim across this particular source's documents.", "dupfarm"),
      (7L, "A perfectly reasonable paragraph that appears many times verbatim across this particular source's documents.", "dupfarm")
    ).toDF("id", "text", "source")
    val stats = graft.operators.Curation
      .sourceReputation(docs, "text", "source",
        minMeanQuality = 0.4, maxDupShare = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("dup_share"),
          r.getAs[Boolean]("keep"))).toMap
    assert(stats("good")._3, stats.toString)       // keeps
    assert(!stats("junk")._3)                      // mean quality fails
    assert(!stats("dupfarm")._3)                   // dup share fails
    assert(stats("dupfarm")._2 > 0.5)
    val kept = graft.operators.Curation
      .bySourceReputation(docs, "text", "source", 0.4, 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    // the filter-back is a broadcast semi-join, never a corpus shuffle
    val plan = graft.operators.Curation
      .bySourceReputation(docs, "text", "source", 0.4, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("semDedupAuto derives k from the corpus size (k ∝ n)") {
    // the scale contract: cluster count grows with n so within-cluster
    // pairwise verification stays constant work per cluster
    def mk(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"),
        array(col("id").cast("double"), lit(1.0)).as("embedding"))
    val small = Dedup.semDedupAuto(mk(100), "vec_id", "embedding",
      eps = 0.99, targetClusterSize = 16L, minK = 4)
    val big = Dedup.semDedupAuto(mk(1000), "vec_id", "embedding",
      eps = 0.99, targetClusterSize = 16L, minK = 4)
    val kSmall = small.select(countDistinct(col("cluster_id"))).head().getLong(0)
    val kBig = big.select(countDistinct(col("cluster_id"))).head().getLong(0)
    // ceil(100/16)=7, ceil(1000/16)=63 requested clusters; the
    // realized count can dip below when a centroid wins no argmax,
    // but growth must show through
    assert(kBig > kSmall, s"derived clusters did not grow: $kSmall -> $kBig")
    assert(kSmall >= 4)
    // floor: a tiny corpus still gets minK clusters requested
    val tiny = Dedup.semDedupAuto(mk(8), "vec_id", "embedding",
      eps = 0.99, targetClusterSize = 1024L, minK = 8)
    assert(tiny.count() == 8)
  }

  test("semDedup is deterministic across reruns") {
    val e = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = Dedup.semDedup(e, "vec_id", "embedding", k = 4, eps = 0.9)
      .orderBy("id").collect().toSeq
    val b = Dedup.semDedup(e, "vec_id", "embedding", k = 4, eps = 0.9)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // every vector is assigned and decided
    assert(a.size == e.count())
  }

  test("importanceResample: target-profile docs outscore off-target ones") {
    // target distribution = english-looking bigrams; doc 10 matches it,
    // doc 11 matches the off-target profile, doc 12 is too short to
    // have bigrams at all
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the rug", true),
      (3L, "le chien dort sur le tapis", false),
      (4L, "le chat dort sur le lit", false),
      (10L, "the cat sat on the rug", false),   // english-profile probe
      (11L, "le chien dort sur le lit", false), // french-profile probe
      (12L, "solo", false)
    ).toDF("id", "text", "tgt")
      .select(col("id"), TextFunctions.wsTokens(lower(col("text"))).as("toks"),
        col("tgt"))
    val out = Curation.importanceResample(docs, "id", "toks", "tgt",
        buckets = 256, frac = 0.5)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(10L).getAs[Double]("logw") > byId(11L).getAs[Double]("logw"))
    assert(byId(12L).getAs[Double]("logw") == 0.0)
    // exact top-n membership: floor(0.5 * 7) = 3 selected
    assert(out.count(_.getAs[Boolean]("selected")) == 3)
    // deterministic across reruns (hash gumbel, no RNG)
    val again = Curation.importanceResample(docs, "id", "toks", "tgt",
      buckets = 256, frac = 0.5).orderBy("id").collect()
    assert(out.toSeq == again.toSeq)
  }

  test("importanceResampleApprox: threshold path tracks the exact marker") {
    // the 100 TB selection path: scores must be IDENTICAL to the exact
    // variant (shared computation); the t-digest threshold's selection
    // rate must track frac, and the kept sets must agree except at the
    // quantile boundary (sketch accuracy, not score disagreement)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id").as("id"),
        TextFunctions.wsTokens(lower(col("text"))).as("toks"),
        (col("lang") === "en").as("tgt"))
    val frac = 0.2
    val exact = Curation.importanceResample(docs, "id", "toks", "tgt",
      buckets = 1024, frac = frac).orderBy("id").collect()
    val approx = Curation.importanceResampleApprox(docs, "id", "toks", "tgt",
      buckets = 1024, frac = frac).orderBy("id").collect()
    assert(exact.length == approx.length)
    // bit-identical scores row by row
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getLong(0) == a.getLong(0))
      assert(e.getAs[Double]("score") == a.getAs[Double]("score"),
        s"id=${e.getLong(0)} score drift")
    }
    val n = exact.length.toDouble
    val rate = approx.count(_.getAs[Boolean]("selected")) / n
    assert(math.abs(rate - frac) < 0.03, s"selection rate $rate vs $frac")
    // set agreement: disagreements only from the threshold ulp/sketch
    val agree = exact.zip(approx).count { case (e, a) =>
      e.getAs[Boolean]("selected") == a.getAs[Boolean]("selected") } / n
    assert(agree >= 0.97, s"selected-set agreement $agree")
  }

  test("importanceResampleAuto: size-threshold routes exact below, approx above") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id").as("id"),
        TextFunctions.wsTokens(lower(col("text"))).as("toks"),
        (col("lang") === "en").as("tgt"))
    // default threshold (1M) >> fixture: auto IS the exact path, bit for bit
    val exact = Curation.importanceResample(docs, "id", "toks", "tgt",
      buckets = 1024, frac = 0.2).orderBy("id").collect()
    val autoLow = Curation.importanceResampleAuto(docs, "id", "toks", "tgt",
      buckets = 1024, frac = 0.2).orderBy("id").collect()
    assert(exact.toSeq == autoLow.toSeq, "auto below threshold must be exact")
    // forced past the threshold: auto IS the approx path, bit for bit
    val approx = Curation.importanceResampleApprox(docs, "id", "toks", "tgt",
      buckets = 1024, frac = 0.2).orderBy("id").collect()
    val autoHigh = Curation.importanceResampleAuto(docs, "id", "toks", "tgt",
      buckets = 1024, frac = 0.2, approxAboveDocs = 0L).orderBy("id").collect()
    assert(approx.toSeq == autoHigh.toSeq, "auto above threshold must be approx")
  }

  test("mixturePlan/realizeMixture: epochs math, up/down-sampling, zero-weight drop") {
    import spark.implicits._
    // A: 20 tokens over 2 docs; B: 10 tokens; C unweighted
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "B", 10L), (4L, "C", 10L))
      .toDF("id", "source", "n")
    val plan = Curation.mixturePlan(docs, "source", "n",
      Map("A" -> 0.75, "B" -> 0.25), budgetTokens = 60L)
    val p = plan.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
        r.getDouble(5))).toMap
    assert(p("A") == ((2L, 20L, 0.75, 45L, 2.25))) // upsample: 2.25 epochs
    assert(p("B") == ((1L, 10L, 0.25, 15L, 1.5)))
    assert(p("C") == ((1L, 10L, 0.0, 0L, 0.0)))    // unweighted
    val out = Curation.realizeMixture(docs, "id", "source", plan, "t1")
      .collect().groupBy(_.getLong(0))
    // every A doc gets 2 or 3 copies (frac 0.25), B doc 1 or 2, C none
    assert(Seq(1L, 2L).forall(id => Set(2, 3).contains(out(id).length)))
    assert(Set(1, 2).contains(out(3L).length))
    assert(!out.contains(4L))
    // copies are numbered 1..n and the realization is deterministic
    assert(out(1L).map(_.getInt(2)).sorted.toSeq == (1 to out(1L).length))
    val again = Curation.realizeMixture(docs, "id", "source", plan, "t1")
      .collect().groupBy(_.getLong(0))
    assert(out.view.mapValues(_.length).toMap ==
      again.view.mapValues(_.length).toMap)
  }

  test("semanticContamination: flags cosine-near eval vectors, min-id ties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), // exact copy of eval 10
      (2L, Seq(0.0, 1.0, 0.0)), // orthogonal to all eval
      (3L, Seq(0.8, 0.0, 0.6))  // cos 0.8 vs eval 10 — below tau
    ).toDF("id", "vec")
    val ev = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),
      (11L, Seq(1.0, 0.0, 0.0)) // duplicate eval vec: tie -> min eid
    ).toDF("id", "vec")
    val out = Curation.semanticContamination(corpus, ev, "id", "vec", 0.99)
      .orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((10L, 1.0, true)))  // tie between 10/11 -> 10
    assert(out(2L)._3 == false && out(2L)._2 == 0.0)
    assert(out(3L) == ((10L, 0.8, false)))
  }

  test("lmPerplexity: hand-computed stupid-backoff scores") {
    import spark.implicits._
    // train counts: bi (a,b)=2 (b,a)=1 (a,c)=1; ctx a=3 b=1;
    // uni a=3 b=2 c=1 x=1 -> N=7 V=4
    val train = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("id", "text")
      .select(col("id"), TextFunctions.wsTokens(col("text")).as("toks"))
    val score = train.unionByName(
      Seq((4L, "a z")).toDF("id", "text") // (a,z) unseen, z OOV
        .select(col("id"), TextFunctions.wsTokens(col("text")).as("toks")))
    val out = Curation.lmPerplexity(train, score, "id", "toks")
      .orderBy("id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc1: lp(a,b)=round(log10(2/3),6)=-0.176091 twice, lp(b,a)=0
    assert(out(1L) == ((3L, -0.352182, 1.3104)))
    // doc2: lp(a,c)=round(log10(1/3),6)
    assert(out(2L) == ((1L, -0.477121, 3.0)))
    // doc3: single token -> unscored
    assert(out(3L) == ((0L, 0.0, 1.0)))
    // doc4: backoff 0.4*(0+1)/(7+4), OOV z
    assert(out(4L) == ((1L, -1.439333, 27.5)))
    // deterministic across reruns (sorted fold, no RNG)
    val again = Curation.lmPerplexity(train, score, "id", "toks")
      .orderBy("id").collect()
    assert(again.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap == out)
  }
}
