package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TextFunctions
import graft.model.{Filters, TenantContext}
import graft.operators.{Chunker, Dedup}

/** SURVEY §5.3 property tests: invariants the reference states (or
  * implies) that must hold for ALL inputs, not just fixtures. Fast
  * driver-side kernels get full ScalaCheck sweeps; DataFrame
  * properties run a bounded number of generated cases. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(60)
  private def check(p: Prop): Unit = assert(SCTest.check(params, p).passed)
  // DataFrame properties launch Spark jobs per case — bound the sweep
  private val sparkParams = SCTest.Parameters.default.withMinSuccessfulTests(12)
  private def checkSpark(p: Prop): Unit = assert(SCTest.check(sparkParams, p).passed)

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("the", "and", "of", "a", "I", "Naïve", "co-op", "3.14", "…")
    )).map(_.mkString(" "))

  test("tokenizer idempotence: tokenize(join(tokenize(t))) == tokenize(t)") {
    check(Prop.forAll(textGen) { t =>
      val once = TextFunctions.tokenizeJvm(t)
      TextFunctions.tokenizeJvm(once.mkString(" ")) == once
    })
  }

  test("tokenizer output contract: lowercase word-chars, len >= 2, no stopwords") {
    val stops = TextFunctions.stopwords.toSet
    check(Prop.forAll(textGen) { t =>
      TextFunctions.tokenizeJvm(t).forall(tok =>
        tok.length >= 2 && tok == tok.toLowerCase &&
          tok.matches("[\\w]+") && !stops.contains(tok))
    })
  }

  test("hash56 range: non-negative, < 2^56, stable") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = TextFunctions.hash56Jvm(s)
      h >= 0L && h < (1L << 56) && h == TextFunctions.hash56Jvm(s)
    })
  }

  test("tenant isolation: no cross-org row for ANY org/access combination") {
    // the reference's stated invariant (tenant_schema.py:1-14)
    val orgs = Seq("org_a", "org_b", "org_c")
    val levels = Seq("public", "internal", "confidential")
    val rows = for (i <- 0 until 120) yield
      (i.toLong, orgs(i % 3), levels(i % 5 % 3))
    val df = rows.toDF("id", "organization_id", "access_level")
    val cases = for {
      org <- Gen.oneOf(orgs)
      ceiling <- Gen.oneOf(levels)
    } yield (org, ceiling)
    checkSpark(Prop.forAll(cases) { case (org, ceiling) =>
      val ctx = TenantContext(org, maxAccessLevel = ceiling)
      val out = Filters.tenantScope(df, ctx)
        .select("organization_id", "access_level").distinct().collect()
      out.forall(r => r.getString(0) == org &&
        ctx.allowedAccess.contains(r.getString(1)))
    })
  }

  test("chunk coverage: windows keep every token, in order, bounded by winSize") {
    val cases = for {
      n <- Gen.choose(1, 200)
      size <- Gen.choose(2, 64)
      overlap <- Gen.choose(0, size - 1)
    } yield (n, size, overlap)
    checkSpark(Prop.forAllNoShrink(cases) { case (n, size, overlap) =>
      val toks = (1 to n).map(i => s"t$i")
      val chunks = Chunker.tokenWindows(
          Seq(("d", toks)).toDF("doc_id", "toks"), "doc_id", "toks", size, overlap)
        .orderBy("chunk_index").collect()
      val stride = size - overlap
      val texts = chunks.map(_.getString(3).split(" ").toSeq)
      val covered = texts.zipWithIndex.flatMap { case (ts, i) =>
        ts.zipWithIndex.map { case (t, j) => (i * stride + j, t) }
      }
      // every position is covered by the token that belongs there…
      covered.forall { case (pos, t) => t == s"t${pos + 1}" } &&
        covered.map(_._1).toSet == (0 until n).toSet &&
        // …and no chunk exceeds the window
        texts.forall(_.length <= size)
    })
  }

  test("exact-dedup idempotence: no groups on a duplicate-free corpus; one per planted dup") {
    val cases = for {
      n <- Gen.choose(2, 60)
      dups <- Gen.choose(0, 5)
    } yield (n, dups)
    checkSpark(Prop.forAllNoShrink(cases) { case (n, dups) =>
      val base = (0 until n).map(i => (i.toLong, s"unique document number $i"))
      val copies = (0 until math.min(dups, n)).map(i =>
        ((1000 + i).toLong, s"unique document number $i"))
      val groups = Dedup.exactGroups(
        (base ++ copies).toDF("id", "text"), "id", "text").collect()
      groups.length == math.min(dups, n) &&
        groups.forall(_.getLong(1) == 2L) &&
        // canonical = min id ⇒ always the original, never the copy
        groups.forall(_.getLong(2) < 1000L)
    })
  }

  test("stratified-sample monotonicity: a higher rate keeps a superset") {
    val docs = spark.range(0, 800).select(col("id"), lit("s").as("g")).cache()
    val cases = for {
      lo <- Gen.choose(0.0, 1.0)
      hi <- Gen.choose(0.0, 1.0)
    } yield (math.min(lo, hi), math.max(lo, hi))
    checkSpark(Prop.forAllNoShrink(cases) { case (lo, hi) =>
      val keptLo = graft.operators.Curation
        .stratifiedSample(docs, "id", "g", Map("s" -> lo), 0.0, "m1")
        .collect().map(_.getLong(0)).toSet
      val keptHi = graft.operators.Curation
        .stratifiedSample(docs, "id", "g", Map("s" -> hi), 0.0, "m1")
        .collect().map(_.getLong(0)).toSet
      keptLo.subsetOf(keptHi)
    })
  }
}
