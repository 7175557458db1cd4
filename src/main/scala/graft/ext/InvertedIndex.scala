package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persistent inverted (postings) index for lexical retrieval — the
  * serving-path counterpart of [[Retrieval.withBm25]] (which scores a
  * one-off scan, the right shape for a single batch query) and the
  * lexical sibling of [[IvfIndex]]. Build once, search many:
  *
  *  - [[build]]: one tokenize+aggregate pass over the corpus →
  *    postings (term, doc_id, tf, dl) written as parquet PARTITIONED
  *    BY a 256-way md5 prefix of the term — the directory count stays
  *    bounded however large the vocabulary, and a query term maps to
  *    exactly one directory. A 1-row stats parquet (n_docs, sum_dl)
  *    rides alongside. No separate df table: a search reads ALL
  *    postings of its query terms anyway, so per-term document
  *    frequencies fall out of the probe for free.
  *  - [[append]]: postings are doc-LOCAL (tf and dl never depend on
  *    other documents), so a crawl delta appends its postings into
  *    the same layout and only the 1-row stats file is rewritten —
  *    no rebuild, no read-modify-write of existing postings. (df and
  *    avgdl shift automatically at the next search; contrast IvfIndex
  *    .append, which must freeze centroids.)
  *  - [[search]]: probes ONLY the partitions holding the query terms
  *    (`p IN (...)` prunes directories at the scan — PartitionFilters,
  *    spec-verified — and the `term IN (...)` filter pushes into the
  *    row groups), broadcasts the tiny df/stats frames, scores BM25,
  *    and TakeOrders k. A search reads ~vocab/256-sized slivers of
  *    the index; the corpus itself is never touched.
  *
  * Scores match [[Retrieval.withBm25]] on hit documents up to
  * aggregation-order ulps (the scan path sums terms in a fixed order;
  * the index path sums posting rows) — the equivalence spec compares
  * at 1e-9, not bit-exact.
  */
object InvertedIndex {

  /** Driver-side md5 hex prefix — must match [[termPrefix]]. */
  private[graft] def prefixOf(term: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    f"${d(0) & 0xff}%02x"
  }

  private def termPrefix(c: Column): Column = substring(md5(c), 1, 2)

  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .withColumn("dl", TextStats.tokenCount(col("__text")).cast("long"))
      .filter(length(col("__text")) > 0)
      .select(col("doc_id"), col("dl"),
              explode(split(col("__text"), " ")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("p", termPrefix(col("term")))

  private def statsOf(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
             sum(TextStats.tokenCount(col(textCol)).cast("long")).as("sum_dl"))

  def build(docs: DataFrame, idCol: String, textCol: String,
            path: String): Unit = {
    postingsOf(docs, idCol, textCol)
      .write.mode("overwrite").partitionBy("p").parquet(s"$path/postings")
    statsOf(docs, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a delta corpus: postings append in place; stats are the
    * old row plus the delta's (rewritten — it is one row). Callers
    * must not append documents whose ids already exist (dedup the
    * crawl first — that is what `dedupAgainstCorpus` is for). */
  def append(spark: SparkSession, path: String, delta: DataFrame,
             idCol: String, textCol: String): Unit = {
    val old = spark.read.parquet(s"$path/stats")
      .select("n_docs", "sum_dl").head()
    postingsOf(delta, idCol, textCol)
      .write.mode("append").partitionBy("p").parquet(s"$path/postings")
    statsOf(delta, idCol, textCol)
      .select((col("n_docs") + old.getLong(0)).as("n_docs"),
              (col("sum_dl") + old.getLong(1)).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k over the indexed corpus for a literal query term set.
    * Returns (doc_id, n_terms_hit, bm25) — documents with no hit
    * never surface (their score is 0). */
  def search(spark: SparkSession, path: String, terms: Seq[String],
             k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "search needs at least one query term")
    val prefixes = terms.map(prefixOf).distinct
    val posts = spark.read.parquet(s"$path/postings")
      .filter(col("p").isin(prefixes: _*) && col("term").isin(terms: _*))
    val staged = graft.ops.Staging.stage(posts)
    val dfTab = staged.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$path/stats")
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val idf = log(lit(1.0) +
      (nD - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tf = col("tf").cast("double")
    staged.join(broadcast(dfTab), "term").crossJoin(broadcast(stats))
      .withColumn("__s", idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("__s").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
