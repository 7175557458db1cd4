package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftExtensions, GraftFunctions}

/** Parity pin for the two registration surfaces. Rounds 1 AND 2 each
  * shipped a gap where `spark.sql.extensions`-injected sessions saw
  * fewer functions than programmatic ones, because the two lists were
  * maintained by hand. Both now iterate [[GraftFunctions.registry]];
  * these tests make any regression (or a third surface drifting) fail
  * loudly.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Expected = Seq(
    "graft_cosine_similarity", "graft_minhash_signature",
    "graft_word_shingles", "graft_hyperplane_bucket",
    "graft_cut_token_spans", "graft_top_element_freq",
    "graft_bloom_filter_agg", "graft_might_contain",
    "graft_topk_by_score", "graft_topk_by_score_str",
    "graft_url_canonicalize",
    "graft_nearest_centroids",
    "graft_simhash32", "graft_simhash64", "graft_token_set_count",
    "graft_vector_sum", "graft_int8_quantize", "graft_int8_dequantize",
    "graft_int8_cosine", "graft_deflate_len",
    "graft_vec_normalize", "graft_pq_encode", "graft_pq_adc_score",
    "graft_jaro_winkler", "graft_hilbert_key",
    "graft_bytes8_max", "graft_bytes8_max_agg")

  test("registry lists every native function exactly once") {
    assert(GraftFunctions.registry.map(_._1).sorted == Expected.sorted)
    assert(GraftFunctions.registry.map(_._1).distinct.size ==
      GraftFunctions.registry.size)
  }

  test("config-injected extension registers the full registry (was 5/8 in r2)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // The injected-function buffer is private[sql]; read it
    // reflectively — if the field moves in a Spark upgrade this test
    // fails loudly, which is the point of a parity pin.
    val field = classOf[SparkSessionExtensions].getDeclaredFields
      .find(_.getName.contains("injectedFunctions"))
      .getOrElse(fail("SparkSessionExtensions.injectedFunctions field not found"))
    field.setAccessible(true)
    val injected = field.get(ext)
      .asInstanceOf[scala.collection.mutable.Buffer[(FunctionIdentifier, _, _)]]
      .map(_._1.funcName).toSeq
    assert(injected.sorted == GraftFunctions.registry.map(_._1).sorted,
      "extension-injected functions must equal GraftFunctions.registry")
  }

  test("ensureRegistered makes every registry function SQL-callable") {
    GraftFunctions.ensureRegistered(spark)
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.registry.foreach { case (name, _) =>
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not registered")
    }
    // end-to-end SQL smoke for the round-3 addition
    val row = spark.sql(
      "SELECT graft_vector_sum(v) AS vs FROM VALUES (array(1.0d, 2.0d)), (array(3.0d, 4.0d)) AS t(v)")
      .selectExpr("vs.sum AS s", "vs.n AS n").head()
    assert(row.getSeq[Double](0) == Seq(4.0, 6.0) && row.getLong(1) == 2L)
  }

  test("a pure-SQL session can run a full ANN top-k through the registered functions") {
    GraftFunctions.ensureRegistered(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    // brute-force cosine top-3 written ONLY in SQL: cast, score with
    // graft_cosine_similarity, keep k per query with the partial
    // graft_topk_by_score aggregate — no Column-API call sites.
    val sql = spark.sql("""
      WITH v AS (
        SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM emb_sql),
      scored AS (
        SELECT q.vec_id AS query_id,
               graft_cosine_similarity(c.vec, q.vec) AS sim,
               c.vec_id AS neighbor_id
        FROM v c JOIN v q ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
      topk AS (
        SELECT query_id, graft_topk_by_score(sim, neighbor_id, 3) AS hits
        FROM scored GROUP BY query_id)
      SELECT query_id, hit.id AS neighbor_id, round(hit.score, 6) AS cosine_sim,
             pos + 1 AS rnk
      FROM topk LATERAL VIEW posexplode(hits) AS pos, hit
      ORDER BY query_id, rnk""")
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val api = graft.ext.Similarity.bruteForceTopK(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
        "vec_id", "embedding", 3)
      .orderBy("query_id", "rnk")
    assert(sql.collect().map(_.toString).toSeq ==
      api.collect().map(_.toString).toSeq,
      "SQL-only ANN must equal the Column-API operator")
  }

  test("deflateLen/deflateRatio separate repetitive from varied text deterministically") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gf = GraftFunctions
    val docs = Seq(
      (1L, "spam " * 400),                                    // template spam
      (2L, (1 to 400).map(i => (i * i * 2654435761L) % 99991).mkString(" ")), // varied
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    def run() = docs
      .select(col("id"), gf.deflateLen(spark, col("text")).as("len"),
        gf.deflateRatio(spark, col("text")).as("ratio"))
      .orderBy("id").collect()
    val rows = run()
    val spamRatio = rows(0).getDouble(2)
    val variedRatio = rows(1).getDouble(2)
    assert(spamRatio < 0.05, s"repetition must compress hard, got $spamRatio")
    assert(variedRatio > 0.3, s"varied text must not, got $variedRatio")
    assert(rows(2).getLong(1) == 0L && rows(2).getDouble(2) == 1.0) // empty
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))              // null
    // byte-deterministic across runs (the pinning contract of q134)
    assert(run().map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  test("jaroWinkler: golden vectors pin the exact IEEE doubles (DuckDB parity)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // expected values are DuckDB jaro_winkler_similarity outputs,
    // bit-exact (the q173 raw-double contract; also verified on every
    // real p_name pair at sf0.01/sf0.1)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),   // transposition-free, uneven lengths
      ("duane", "dwayne", 0.8400000000000001),
      ("abcd", "abce", 0.8833333333333334),
      ("CRANE", "CRATE", 0.9066666666666667),
      ("goldenrod lavender spring", "goldenrod lavender sprung", 0.984),
      ("abc", "abc", 1.0),
      ("", "", 1.0),
      ("x", "", 0.0),
      ("ab", "cd", 0.0))                           // m == 0 short-circuit
    val df = cases.zipWithIndex
      .map { case ((a, b, e), i) => (i, a, b, e) }
      .toDF("id", "a", "b", "expected")
    val got = df.select(col("id"), col("expected"),
        GraftFunctions.jaroWinkler(spark, col("a"), col("b")).as("jw"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"row ${r.getInt(0)}: got ${r.getDouble(2)}, want ${r.getDouble(1)}")
    }
    // null propagates; SQL surface matches the Column API
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(spark, col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").collect().head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(viaSql) ==
           java.lang.Double.doubleToLongBits(0.9611111111111111))
  }
}
