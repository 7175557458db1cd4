package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** One-call training-data document preparation — the standard ingest
  * composition a 100 TB text pipeline runs before tokenization,
  * assembled from the repo's own operators:
  *
  *  1. exact dedup: keep the LOWEST-id document per md5(text)
  *     ([[Dedup.exactDupGroups]] family — shuffles 16-byte hashes +
  *     whatever columns the caller keeps, never re-reads bodies twice);
  *  2. language-ID: marker-profile scores + deterministic argmax
  *     ([[TextStats.withLangScores]]/[[TextStats.predictLang]], native
  *     token-set counting — no interpreted lambdas on the scan);
  *  3. quality scoring ([[TextStats.qualityScore]]);
  *  4. token counting ([[TextStats.tokenCount]] — length arithmetic);
  *  5. filter: quality >= minQuality, predicted language in keepLangs.
  *
  * Plan shape: ONE scan of the corpus and ONE shuffle (the dedup
  * window keyed on the content hash); every scoring column is a
  * codegen'd projection on the deduped stream, and the quality/lang
  * filters sit directly above it (no second pass). Returns the
  * surviving rows with provenance columns (content_hash, lang
  * scores, predicted_lang, n_tokens, quality).
  *
  * The quality threshold compares the UNROUNDED score — both engines
  * evaluate the identical IEEE expression, so the comparison is
  * deterministic cross-engine (rounding only ever happens on output
  * columns, per the repo's oracle-parity rules).
  */
object DocPrep {

  /** Output columns this operator adds; input columns with these
    * names would be silently clobbered and the quality filter would
    * run on the recomputed value — refuse loudly instead. */
  private val Reserved =
    Seq("content_hash", "predicted_lang", "n_tokens", "quality")

  def prepare(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String],
              profiles: Seq[(String, Seq[String])],
              minQuality: Double,
              keepLangs: Seq[String]): DataFrame = {
    val clash = docs.columns.intersect(
      Reserved ++ profiles.map(p => s"score_${p._1}"))
    require(clash.isEmpty,
      s"DocPrep.prepare reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val withHash = docs.withColumn("content_hash", md5(col(textCol)))
    val deduped = Kernels.top1PerGroup(withHash,
      keys = Seq("content_hash"), order = Seq(col(idCol)))
    val scored = TextStats.withLangScores(deduped, textCol, profiles)
      .withColumn("predicted_lang", TextStats.predictLang(profiles))
      .withColumn("n_tokens", TextStats.tokenCount(col(textCol)))
      .withColumn("quality", TextStats.qualityScore(col(textCol), stopwords))
    scored
      .filter(col("quality") >= minQuality &&
              col("predicted_lang").isin(keepLangs: _*))
  }
}
