package graft

/** SQL surface (S10): every graft kernel must be reachable from plain
  * `spark.sql` via [[GraftExtensions]], and the SQL results must be
  * bit-identical to the DataFrame-API twins. */
class ExtensionsSpec extends SparkSpec {

  test("every registered function resolves from SQL") {
    for ((name, _, _) <- GraftExtensions.registrations)
      assert(spark.catalog.functionExists(name), s"$name not registered")
  }

  test("SQL twins match the DataFrame API bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.{EmbedFunctions, HashFunctions, VectorFunctions}

    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(0.5, -1.0, 2.0), Array(11L, 7L, 93L)))
      .toDF("a", "b", "hs")
    df.createOrReplaceTempView("ext_probe")

    val sql = spark.sql(
      """SELECT graft_dot(a, b) AS d, graft_cosine(a, b) AS c,
        |  graft_minhash(hs, 8) AS mh, graft_simhash(hs, 56) AS sh,
        |  graft_feature_embed(hs, 16) AS fe,
        |  graft_hyperplane_buckets(a, 4, 6) AS hb,
        |  graft_porter_stem('connection') AS st
        |FROM ext_probe""".stripMargin).collect().head

    val api = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.cosine($"a", $"b").as("c"),
      HashFunctions.minhashSig($"hs", 8).as("mh"),
      HashFunctions.simhash($"hs", 56).as("sh"),
      EmbedFunctions.featureHashEmbed($"hs", 16).as("fe"),
      VectorFunctions.hyperplaneBuckets($"a", 4, 6).as("hb"))
      .collect().head

    assert(sql.getDouble(0) == api.getDouble(0))
    assert(sql.getDouble(1) == api.getDouble(1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
    assert(sql.getLong(3) == api.getLong(3))
    assert(sql.getSeq[Double](4) == api.getSeq[Double](4))
    assert(sql.getSeq[Long](5) == api.getSeq[Long](5))
    assert(sql.getString(6) == "connect")
  }

  test("text kernels reachable from SQL") {
    val r = spark.sql(
      """SELECT graft_tokenize('Payment terms are net 30 days!') AS t,
        |  graft_ws_tokens(' a  b ') AS w,
        |  graft_lang_id(array('the', 'and', 'of')) AS l""".stripMargin)
      .collect().head
    assert(r.getSeq[String](0) == Seq("payment", "terms", "net", "30", "days"))
    assert(r.getSeq[String](1) == Seq("a", "b"))
    assert(r.getString(2) == "en")
  }

  test("MaxSim reachable from SQL over patch matrices") {
    import spark.implicits._
    Seq((Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(Seq(0.5, 0.5), Seq(1.0, 0.0))))
      .toDF("q", "d").createOrReplaceTempView("ext_maxsim")
    val v = spark.sql("SELECT graft_maxsim(q, d) AS s FROM ext_maxsim")
      .collect().head.getDouble(0)
    // row 1 best dot = 1.0 (patch 1), row 2 best = 0.5 → sum 1.5
    assert(math.abs(v - 1.5) < 1e-12)
  }

  test("packed f32 MaxSim reachable from SQL, matches the nested form") {
    import spark.implicits._
    Seq((Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), Seq(Seq(0.5, 0.5), Seq(1.0, 0.0))))
      .toDF("q", "d").createOrReplaceTempView("ext_maxsim_f32")
    val r = spark.sql(
      """SELECT graft_maxsim(q, d) AS exact,
        |  graft_maxsim_f32(q, graft_pack_f32(d, 2), 2) AS packed
        |FROM ext_maxsim_f32""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
  }

  test("non-literal sketch size is rejected at analysis time") {
    import spark.implicits._
    Seq((Array(1L, 2L), 8)).toDF("hs", "k").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(hs, k) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
