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

  /** The FULL curation pipeline in one call — what a training-data
    * ingest actually runs, composed from the repo's operators in the
    * canonical order:
    *
    *  1. exact dedup (keep-lowest-id per md5(text); the one corpus
    *     shuffle);
    *  2. NEAR-dup dedup: 64-bit SimHash pigeonhole pairs
    *     ([[Dedup.simHashNearDups]]) → connected components
    *     ([[Dedup.connectedComponents]]) → keep each cluster's
    *     lowest-id representative (singletons keep themselves);
    *  3. repetition/structure gates ([[TextStats.repetitionFilter]]
    *     semantics, map-side);
    *  4. language-ID + quality + token count + filter (the
    *     [[prepare]] stages, map-side);
    *  5. deterministic fold assignment ([[Sampling.withFold]],
    *     map-side).
    *
    * Stages 3-5 are codegen'd projections/filters on the deduped
    * stream; the only shuffles are the content-hash dedup, the banded
    * pair join, and the component sweeps over the (tiny) pair graph.
    * Every stage's decision compares UNROUNDED values, so the whole
    * pipeline is cross-engine deterministic and the driver oracle
    * (q69) mirrors it stage for stage.
    */
  def prepareFull(docs: DataFrame, idCol: String, textCol: String,
                  stopwords: Seq[String],
                  profiles: Seq[(String, Seq[String])],
                  minQuality: Double,
                  keepLangs: Seq[String],
                  nearDupMaxHamming: Int = 3,
                  maxRepRatio: Double = 0.3,
                  maxDupBigramRatio: Double = 0.3,
                  maxSymbolRatio: Double = 0.1,
                  minMeanWordLen: Double = 2.0,
                  maxMeanWordLen: Double = 12.0,
                  folds: Seq[(String, Double)] =
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                  foldSalt: String = ""): DataFrame = {
    val clash = docs.columns.intersect(
      Reserved ++ Seq("component", "fold") ++ profiles.map(p => s"score_${p._1}"))
    require(clash.isEmpty,
      s"DocPrep.prepareFull reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val withHash = docs.withColumn("content_hash", md5(col(textCol)))
    // staged: the deduped stream fans out to the pair generator AND
    // the representative filter
    val deduped = graft.ops.Staging.stage(Kernels.top1PerGroup(withHash,
      keys = Seq("content_hash"), order = Seq(col(idCol))))
    val pairs = Dedup.simHashNearDups(deduped, idCol, textCol,
      maxHamming = nearDupMaxHamming, bits = 64)
    val kept = Dedup.withDupComponent(deduped, idCol, pairs)
      .filter(col(idCol) === col("component"))
    val gated = TextStats.withRepetitionStats(kept, textCol)
      .filter(col("rep_ratio") <= maxRepRatio &&
              col("dup_bigram_ratio") <= maxDupBigramRatio &&
              col("symbol_ratio") <= maxSymbolRatio &&
              col("mean_word_len") >= minMeanWordLen &&
              col("mean_word_len") <= maxMeanWordLen)
      .drop("rep_ratio", "dup_bigram_ratio", "symbol_ratio", "mean_word_len")
    val scored = TextStats.withLangScores(gated, textCol, profiles)
      .withColumn("predicted_lang", TextStats.predictLang(profiles))
      .withColumn("n_tokens", TextStats.tokenCount(col(textCol)))
      .withColumn("quality", TextStats.qualityScore(col(textCol), stopwords))
      .filter(col("quality") >= minQuality &&
              col("predicted_lang").isin(keepLangs: _*))
    Sampling.withFold(scored, col(idCol), folds, foldSalt)
  }
}
