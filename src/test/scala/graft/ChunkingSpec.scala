package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[graft.ext.Chunking.contentDefinedChunks]] — the
  * mapPartitions CDC kernel that replaced q251's per-position explode
  * + lead() window (the r13 weak flag: that shape shipped the FULL
  * document text on every boundary row through the window exchange,
  * quadratic in document length).
  *
  * The EXACTNESS contract is pinned by replaying the expression
  * formulation (md5(substring(text, p, 8)) boundaries + lead spans)
  * on real testdata and asserting the kernel's chunk multiset is
  * identical — so the DuckDB oracle, which replays the same
  * expressions, keeps matching by transitivity.
  */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The retired expression formulation, kept here as the reference
    * replay: per-position explode, md5 boundary rule, lead() spans. */
  private def replayChunks(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val pos = df
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr("sequence(1, greatest(len - 7, 1))")).as("p"))
    val bounds = pos.filter(expr(
      "p = 1 OR CAST(conv(substring(md5(substring(text, p, 8)), 1, 4), " +
        "16, 10) AS BIGINT) % 32 = 0"))
    val w = Window.partitionBy("doc_id").orderBy("p")
    bounds.withColumn("np", lead("p", 1).over(w))
      .select(col("doc_id"),
        expr("substring(text, p, coalesce(np, len + 1) - p)").as("chunk"))
  }

  private def kernelChunks(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.ext.Chunking.contentDefinedChunks(
      df.select("doc_id", "text"), "text", Seq("doc_id"))

  private def ledger(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select(col("doc_id").cast("long").as("doc_id"),
        md5(col("chunk")).as("ch"))
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("kernel ≡ expression replay on real documents (sf0.001)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    assert(ledger(kernelChunks(docs)) === ledger(replayChunks(docs)))
  }

  test("chunks reassemble the document exactly, in chunk_ix order") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val rebuilt = kernelChunks(docs)
      .groupBy("doc_id")
      .agg(concat_ws("",
        array_sort(collect_list(struct(col("chunk_ix"), col("chunk"))))
          .getField("chunk")).as("rebuilt"))
    val bad = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt")).count()
    assert(bad === 0)
  }

  test("codepoint contract: multi-byte text chunks like the expression replay") {
    // 2-byte (é), 3-byte (中), 4-byte/surrogate (𝄞) codepoints mixed
    // into ASCII — Spark substring/length are codepoint-indexed, so
    // the kernel's byte-offset table must agree with the replay
    val docs = Seq(
      (1L, "caffé latté with 中文字符 and clef 𝄞 marks " * 20),
      (2L, "𝄞𝄞𝄞 openers and é closers é" * 15),
      (3L, "plain ascii control document padded out " * 25),
      (4L, "短 short"),
      (5L, "")
    ).toDF("doc_id", "text")
    assert(ledger(kernelChunks(docs)) === ledger(replayChunks(docs)))
    // and the rebuild survives multi-byte spans
    val rebuilt = kernelChunks(docs)
      .groupBy("doc_id")
      .agg(concat_ws("",
        array_sort(collect_list(struct(col("chunk_ix"), col("chunk"))))
          .getField("chunk")).as("rebuilt"))
    val bad = docs.join(rebuilt, "doc_id")
      .filter(col("text") =!= col("rebuilt")).count()
    assert(bad === 0)
  }

  test("boundary rule: ~1/32 of positions open chunks on random text") {
    val rnd = new scala.util.Random(42)
    val text = (0 until 20000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val n = kernelChunks(df).count()
    // E[chunks] ≈ len/32 ≈ 625; allow a wide band
    assert(n > 300 && n < 1200, s"chunk count $n outside the 1/32 band")
  }
}
