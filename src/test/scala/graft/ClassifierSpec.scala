package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Trained quality classifier (batch perceptron over hashed
  * bag-of-words): label rule, convergence on separable data,
  * bit-exact determinism, totality on empty docs, and distillation
  * quality on held-out docs. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val fluent =
    "the terms of the agreement are set out in a schedule that is agreed for the parties with care"
  private val garbage =
    "xj9 qq zz kk vv bb " * 6 + "asdfgh jklzxc qwerty uiopas dfghjk lzxcvb"

  test("weak labeler: stopword-dense docs are +1, junk and short docs -1") {
    val docs = Seq(
      ("good", fluent),
      ("junk", garbage),
      ("short", "the cat sat"), // <5 words → -1 despite stopwords
      ("empty", "")).toDF("doc_id", "text")
    val lab = Classifier.labeled(docs, "doc_id", "text")
      .select("id", "y").as[(String, Long)].collect().toMap
    assert(lab == Map("good" -> 1L, "junk" -> -1L,
      "short" -> -1L, "empty" -> -1L))
  }

  test("training converges on separable data: zero misclassified after training") {
    val docs = (1 to 20).map(i => (s"g$i", fluent + s" clause$i"))
      .++((1 to 20).map(i => (s"b$i", garbage + s" nois$i")))
      .toDF("doc_id", "text")
    val lab = Classifier.labeled(docs, "doc_id", "text").cache()
    val w = Classifier.train(lab, epochs = 12)
    val mis = Classifier.score(lab, w)
      .filter($"y" * $"margin" <= 0).count()
    lab.unpersist(false)
    assert(mis == 0L, s"$mis docs still misclassified")
  }

  test("training is bit-exact deterministic") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    val lab = Classifier.labeled(docs, "doc_id", "text")
    val w1 = Classifier.train(lab)
    val w2 = Classifier.train(lab)
    assert(w1.toSeq == w2.toSeq)
    assert(w1.length == Classifier.Bins + 1)
  }

  test("empty docs score through the bias slot, margins are integers") {
    val docs = Seq(("e", ""), ("g", fluent)).toDF("doc_id", "text")
    val lab = Classifier.labeled(docs, "doc_id", "text")
    val scored = Classifier.score(lab, Array.fill(Classifier.Bins)(0L) :+ 7L)
      .select("id", "margin", "pred").as[(String, Long, Long)]
      .collect().map { case (k, m, p) => k -> ((m, p)) }.toMap
    // only the bias contributes under a bias-only weight vector
    assert(scored("e") == ((7L, 1L)) && scored("g") == ((7L, 1L)))
  }

  test("distillation: model trained on half the corpus predicts the rule on the held-out half") {
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    val lab = Classifier.labeled(docs, "doc_id", "text").cache()
    val trainHalf = lab.filter(abs(hash($"id")) % 2 === 0)
    val testHalf = lab.filter(abs(hash($"id")) % 2 === 1)
    val w = Classifier.train(trainHalf, epochs = 8)
    val (right, total) = {
      val scored = Classifier.score(testHalf, w)
      (scored.filter($"pred" === $"y").count(), scored.count())
    }
    lab.unpersist(false)
    assert(total > 50, s"held-out too small: $total")
    assert(right.toDouble / total >= 0.8,
      s"held-out accuracy ${right.toDouble / total} below 0.8 ($right/$total)")
  }
}
