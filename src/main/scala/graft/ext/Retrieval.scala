package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Sparse-retrieval scoring over a document corpus: BM25 against a
  * literal query term set (Robertson et al., the classic probabilistic
  * ranking function; the +1-inside-the-log "BM25+"-style idf that is
  * always positive, as used by Lucene).
  *
  * Scale shape: per-term tf and the document length are computed
  * MAP-SIDE by codegen'd native expressions
  * ([[graft.functions.TokenSetCount]] / token count — one pass over
  * the text, no explode, no shuffle). The corpus statistics the score
  * needs (N, total token count, per-term document frequencies) are ONE
  * global aggregate collapsing to a single row that broadcast-joins
  * back — the same "model table becomes a plan constant" move as
  * DSIR's bucket model. The only shuffle in a top-k retrieval is the
  * final TakeOrdered. At 100 TB the aggregate is a tree-reduce over
  * ~1 row per task and the scoring pass is embarrassingly parallel;
  * nothing materializes an inverted index (for repeated-query serving
  * you would — this is the scan-time scoring path).
  *
  * Token unit: the whitespace token, like every text operator here
  * (see Chunking's tokenizer-contract note).
  */
object Retrieval {

  /** Adds `dl` (token count) and `bm25` (unrounded score) for the
    * given literal query terms. k1/b are the standard defaults.
    *
    * The score is written with an exactly-reproducible operand order
    * (left-assoc per-term sum; each term
    * `idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl / avgdl))`
    * with `avgdl = sum_dl / n_docs` in doubles) so a SQL oracle can
    * replay it bit-for-bit up to the final `ln` ulp — order on the
    * ROUNDED score with an id tie-break, the q80 rule.
    */
  def withBm25(df: DataFrame, textCol: String, terms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75,
               out: String = "bm25"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfCol = terms.indices.map(i => s"__tf_$i")
    val base = terms.zipWithIndex.foldLeft(
      df.withColumn("__dl", TextStats.tokenCount(col(textCol)))) {
      case (acc, (t, i)) =>
        acc.withColumn(s"__tf_$i", GraftFunctions.tokenSetCount(col(textCol), Seq(t)))
    }
    val stats = base.agg(
      count(lit(1)).as("__n_docs"),
      (sum(col("__dl").cast("long")).as("__sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))): _*)
    val joined = base.crossJoin(broadcast(stats))
    val nD = col("__n_docs").cast("double")
    val avgdl = col("__sum_dl").cast("double") / nD
    val score: Column = terms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val dfd = col(s"__df_$i").cast("double")
      val idf = log(lit(1.0) + (nD - dfd + lit(0.5)) / (dfd + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl))
    }.reduce(_ + _)
    joined
      .withColumn("dl", col("__dl").cast("long"))
      .withColumn("n_hits",
        tfCol.map(c => col(c).cast("long")).reduce(_ + _))
      .withColumn(out, score)
      .drop(("__dl" +: "__n_docs" +: "__sum_dl" +:
        (tfCol ++ terms.indices.map(i => s"__df_$i"))): _*)
  }

  /** Per-group distinctive terms — class-based TF-IDF (the topic-
    * labeling step of BERTopic-style clustering, and the "what makes
    * this domain different" report in corpus triage):
    * `score(g, t) = tf_{g,t} * ln(nGroups / groupDf_t)` where
    * groupDf counts GROUPS containing the term. Terms present in
    * every group score exactly 0.
    *
    * Scale shape: one explode collapses map-side into the
    * (group, term) aggregate; that frame is staged (three consumers:
    * group-df aggregate, nGroups aggregate, the scoring join) and is
    * at most vocab x groups rows — the corpus never re-shuffles.
    * Returns (groupCol, term, tf, df_groups, score) unrounded;
    * consumers rank on the ROUNDED score with a term tie-break (the
    * q80 rule).
    */
  def distinctiveTerms(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val toks = df.filter(length(col(textCol)) > 0)
      .select(col(groupCol), explode(split(col(textCol), " ")).as("term"))
    val tf = graft.ops.Staging.stage(
      toks.groupBy(groupCol, "term").agg(count(lit(1)).as("tf")))
    val dfGroups = tf.groupBy("term").agg(count(lit(1)).as("df_groups"))
    val ng = tf.agg(countDistinct(groupCol).cast("double").as("__ng"))
    tf.join(dfGroups, "term").crossJoin(broadcast(ng))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("__ng") / col("df_groups").cast("double")))
      .select(col(groupCol), col("term"), col("tf"), col("df_groups"),
              col("score"))
  }
}
