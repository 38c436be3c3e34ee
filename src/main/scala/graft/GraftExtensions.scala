package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the custom Catalyst kernels (S10): registering this
  * class via `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions()(_))`)
  * makes every graft kernel callable from plain `spark.sql` — the
  * library's equivalent of the reference's REST query surface
  * (`src/api/main.py`), expressed the Spark-native way so BI tools /
  * thriftserver clients reach the same codegen'd expressions as the
  * DataFrame API.
  *
  *   SELECT graft_dot(a.emb, b.emb)            -- V1 kernel
  *   SELECT graft_maxsim(qpatches, patches)    -- A15/V2 kernel
  *   SELECT graft_minhash(hashes, 64)          -- MinHash sketch
  *   SELECT graft_simhash(hashes, 56)          -- SimHash fingerprint
  *   SELECT graft_feature_embed(hashes, 64)    -- I9 deterministic embed
  *   SELECT graft_hyperplane_buckets(emb, 4, 6)-- ANN/LSH bucket keys
  *   SELECT graft_porter_stem(term)            -- optional stemmer
  *
  * Int parameters arrive as foldable literals (the idiomatic SQL shape
  * for sketch sizes); non-literal sizes are rejected at analysis time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        (args: Seq[Expression]) => builder(name, args)))
    }
}

object GraftExtensions {

  private def intLit(name: String, e: Expression, pos: Int): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$name: argument ${pos + 1} must be an integer literal, got $e")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")

  /** (name, usage, builder). One entry per kernel — the registry the
    * class injects and the spec iterates. */
  val registrations: Seq[(String, String, (String, Seq[Expression]) => Expression)] = Seq(
    ("graft_dot", "graft_dot(a, b) - dot product of two double arrays",
      (n, a) => { arity(n, a, 2); DotProduct(a(0), a(1)) }),
    ("graft_cosine", "graft_cosine(a, b) - cosine similarity of two double arrays",
      (n, a) => { arity(n, a, 2); CosineSim(a(0), a(1)) }),
    ("graft_maxsim", "graft_maxsim(q, d) - ColBERT/ColPali MaxSim of two patch matrices",
      (n, a) => { arity(n, a, 2); MaxSim(a(0), a(1)) }),
    ("graft_pack_f32", "graft_pack_f32(patches, dim) - row-major float32 binary packing of a patch matrix",
      (n, a) => { arity(n, a, 2); PackF32(a(0), intLit(n, a(1), 1)) }),
    ("graft_maxsim_f32", "graft_maxsim_f32(q, packed, dim) - MaxSim against a pack_f32 binary cell",
      (n, a) => { arity(n, a, 3); MaxSimF32(a(0), a(1), intLit(n, a(2), 2)) }),
    ("graft_minhash", "graft_minhash(hashes, k) - k-perm MinHash signature of a bigint array",
      (n, a) => { arity(n, a, 2); MinHashSig(a(0), intLit(n, a(1), 1)) }),
    ("graft_simhash", "graft_simhash(hashes, bits) - SimHash fingerprint of a bigint array",
      (n, a) => { arity(n, a, 2); SimHash(a(0), intLit(n, a(1), 1)) }),
    ("graft_feature_embed", "graft_feature_embed(hashes, dim) - deterministic feature-hash embedding",
      (n, a) => { arity(n, a, 2); FeatureHashEmbed(a(0), intLit(n, a(1), 1)) }),
    ("graft_hyperplane_buckets", "graft_hyperplane_buckets(vec, tables, bits) - LSH bucket ids per table",
      (n, a) => { arity(n, a, 3)
        HyperplaneBuckets(a(0), intLit(n, a(1), 1), intLit(n, a(2), 2)) }),
    ("graft_porter_stem", "graft_porter_stem(term) - Porter-stemmed term",
      (n, a) => { arity(n, a, 1); PorterStem(a(0)) }),
    ("graft_tokenize", "graft_tokenize(text) - BM25 tokenizer (lowercase, punct-strip, stopwords, len>=2)",
      (n, a) => { arity(n, a, 1); Tokenize(a(0)) }),
    ("graft_ws_tokens", "graft_ws_tokens(text) - whitespace tokens (no filtering)",
      (n, a) => { arity(n, a, 1); WsTokens(a(0)) }),
    ("graft_lang_id", "graft_lang_id(tokens) - function-word language ID (en/de/es/fr/zh/und)",
      (n, a) => { arity(n, a, 1); LangId(a(0)) }),
  )
}
