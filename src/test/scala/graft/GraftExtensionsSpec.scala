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
    "graft_topk_by_score", "graft_nearest_centroids",
    "graft_simhash32", "graft_token_set_count", "graft_vector_sum")

  test("registry lists every native function exactly once") {
    assert(GraftFunctions.registry.map(_._1).sorted == Expected.sorted)
    assert(GraftFunctions.registry.map(_._1).distinct.size ==
      GraftFunctions.registry.size)
  }

  test("config-injected extension registers the full registry (8/8 was 5/8 in r2)") {
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
}
