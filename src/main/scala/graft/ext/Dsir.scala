package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) plus the bucket-LM cross-entropy quality signal —
  * the distribution-matching step of training-corpus assembly, where a
  * huge raw crawl is scored by how much each document looks like a
  * small high-quality target set.
  *
  * Feature space: hashed n-grams. Every unigram and bigram of the
  * whitespace tokenization (the engine-wide tokenizer contract, see
  * [[Chunking]]) hashes into `16^hexChars` buckets keyed by an md5 hex
  * PREFIX — a string key any engine (including the DuckDB oracle)
  * computes bit-identically, with no integer parsing. Bucketing bounds
  * the model at a few thousand cells regardless of corpus size: the
  * statistics fit in one broadcast at 100 TB exactly as at 100 MB,
  * which is the property that makes the method scale (a raw-vocabulary
  * LM's dictionary would outgrow a broadcast and force a shuffle join
  * per gram).
  *
  * Both estimators make exactly TWO passes over the text column and
  * carry nothing larger than a per-document row through any shuffle:
  *  - pass 1 aggregates gram occurrences per bucket (map-side partial
  *    aggregation collapses each partition to <= 16^hexChars rows
  *    before the exchange); the resulting bucket table is
  *    [[graft.ops.Staging staged]] and its grand totals driver-
  *    collected — the same tiny-aggregate-to-plan-constant move as
  *    [[Sampling.mixtureResample]] and the IVF centroid table;
  *  - pass 2 re-derives grams, broadcast-joins the bucket table, and
  *    sums per document (grams of one document never leave their
  *    partition, so the partial aggregate collapses to one row per
  *    document before the exchange).
  * Re-deriving grams instead of persisting the exploded frame is
  * deliberate: exploded grams are LARGER than the input text, so at
  * scale a second projected parquet scan is cheaper than caching them
  * (the same trade [[TextStats.withDupSpanStats]] documents).
  *
  * Laplace-smoothed log-ratio: for bucket b with target count t_b,
  * raw count r_b, totals T and R over B = 16^hexChars buckets,
  *   delta_b = ln((t_b + 1)/(T + B)) - ln((r_b + 1)/(R + B))
  * and a document's importance weight is sum_b c_db * delta_b over its
  * gram counts c_db. Buckets no gram hashes into contribute only
  * smoothing mass and cancel in the per-document difference, so
  * aggregating observed buckets is exact. The formula is evaluated in
  * exactly this IEEE order on both engines; ln is the only cross-libm
  * surface, and consuming queries round to 6dp (an ulp-level libm
  * divergence cannot move a rounded irrational value off its grid cell
  * except within ~1e-9 of a half — the class the repo-wide rounding
  * convention already accepts).
  *
  * The reference has no data-selection surface (it loads a curated
  * statement archive, `data.py`); this module is part of the
  * beyond-reference training-pipeline layer.
  */
object Dsir {

  /** Hash bucket of a gram: the first `hexChars` hex chars of md5.
    * A fixed-width lowercase-hex STRING — groups and compares
    * identically on every engine; 16^hexChars distinct values. */
  def bucketOf(gram: Column, hexChars: Int = 3): Column =
    substring(md5(gram), 1, hexChars)

  /** One row per gram occurrence: (id, extra..., __gram). Unigrams +
    * bigrams of the whitespace tokenization, every position (counts
    * are the signal). Empty/null text yields no rows — consumers
    * left-join back to the corpus and treat absent ids as zero
    * grams. */
  private def gramOccurrences(docs: DataFrame, idCol: String, textCol: String,
                              extra: Seq[Column] = Nil): DataFrame = {
    val spark = docs.sparkSession
    val t = col(textCol)
    // split("", " ") is [""] — one bogus empty token — so empty text is
    // guarded to an empty array (the tokenCount('') = 0 contract).
    val grams = when(t.isNull || length(t) === 0, array().cast("array<string>"))
      .otherwise(concat(
        graft.functions.GraftFunctions.wordShinglesAll(spark, t, 1),
        graft.functions.GraftFunctions.wordShinglesAll(spark, t, 2)))
    docs.select((col(idCol) +: extra) :+ explode(grams).as("__gram"): _*)
  }

  private def requireFresh(docs: DataFrame, out: Seq[String]): Unit =
    out.foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — rename it first"))

  /** DSIR importance weights: appends `n_grams` (long), `llr` (the
    * summed log-likelihood ratio, double) and `llr_per_gram` to
    * `docs`. `isTarget` marks the rows whose distribution the weights
    * point toward (e.g. `col("lang") === "en"`, or a quality gate;
    * null counts as false). Documents with no grams (empty/null text)
    * get (0, 0.0, 0.0). Materializes the pass-1 bucket table on first
    * use (staged; released by [[graft.ops.Staging.releaseAll]]). */
  def withImportanceWeights(docs: DataFrame, idCol: String, textCol: String,
                            isTarget: Column, hexChars: Int = 3): DataFrame = {
    require(hexChars >= 1 && hexChars <= 6, "hexChars must be in [1, 6]")
    requireFresh(docs, Seq("n_grams", "llr", "llr_per_gram"))
    val b = math.pow(16.0, hexChars) // exact for hexChars <= 6
    val counts = graft.ops.Staging.stage(
      gramOccurrences(docs, idCol, textCol, Seq(isTarget.as("__t")))
        .groupBy(bucketOf(col("__gram"), hexChars).as("__b"))
        .agg(count(lit(1)).as("__r"),
             sum(when(col("__t"), 1L).otherwise(0L)).as("__tc")))
    // grand totals: two exact longs off the staged 16^hexChars-row
    // table — plan-time constants, like mixtureResample's fractions
    val tot = counts.agg(sum("__r"), sum("__tc")).head()
    val (rT, tT) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble)
    val delta = counts.select(
      col("__b"),
      (log((col("__tc") + lit(1.0)) / lit(tT + b)) -
       log((col("__r")  + lit(1.0)) / lit(rT + b))).as("__delta"))
    val perDoc = gramOccurrences(docs, idCol, textCol)
      .join(broadcast(delta), bucketOf(col("__gram"), hexChars) === col("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("__delta").as("llr"))
    docs.join(perDoc, Seq(idCol), "left").select(
      docs.columns.map(col) ++ Seq(
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("llr"), lit(0.0)).as("llr"),
        coalesce(col("llr") / col("n_grams"), lit(0.0)).as("llr_per_gram")): _*)
  }

  /** A fitted bucket unigram LM: the per-bucket negative
    * log-likelihood table (tiny — broadcast at scoring time), the
    * out-of-model smoothing floor, and the bucket width. Fit once
    * with [[fitCrossEntropyModel]], apply many times with
    * [[scoreCrossEntropy]] — a frozen model also scores STREAMS
    * (per micro-batch via foreachBatch), where refitting per batch
    * would silently change the measure between batches. */
  final case class XentModel(nll: DataFrame, floor: Double, hexChars: Int)

  /** Fit the Laplace-smoothed bucket unigram model on `reference`:
    * one pass (map-side partial aggregation to <= 16^hexChars rows),
    * staged, totals driver-collected. */
  def fitCrossEntropyModel(reference: DataFrame, idCol: String,
                           textCol: String, hexChars: Int = 3): XentModel = {
    require(hexChars >= 1 && hexChars <= 6, "hexChars must be in [1, 6]")
    val b = math.pow(16.0, hexChars)
    val counts = graft.ops.Staging.stage(
      gramOccurrences(reference, idCol, textCol)
        .groupBy(bucketOf(col("__gram"), hexChars).as("__b"))
        .agg(count(lit(1)).as("__r")))
    val rT = counts.agg(sum("__r")).head().getLong(0).toDouble
    val nll = counts.select(
      col("__b"), (-log((col("__r") + lit(1.0)) / lit(rT + b))).as("__nll"))
    XentModel(nll, -math.log(1.0 / (rT + b)), hexChars)
  }

  /** Score `docs` under a fitted model: appends `n_grams` (long) and
    * `xent` — the average negative log-likelihood (nats per gram).
    * Grams whose bucket the model never observed take the smoothing
    * floor. Documents with no grams get xent 0.0 — filter
    * `n_grams > 0` before averaging, as the oracle does. One pass
    * over `docs`; the model table broadcasts. */
  def scoreCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                        model: XentModel): DataFrame = {
    requireFresh(docs, Seq("n_grams", "xent"))
    val perDoc = gramOccurrences(docs, idCol, textCol)
      .join(broadcast(model.nll),
            bucketOf(col("__gram"), model.hexChars) === col("__b"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
           sum(coalesce(col("__nll"), lit(model.floor))).as("__sum_nll"))
    docs.join(perDoc, Seq(idCol), "left").select(
      docs.columns.map(col) ++ Seq(
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("__sum_nll") / col("n_grams"), lit(0.0)).as("xent")): _*)
  }

  /** Bucket-LM cross-entropy in one call: fit on `reference`
    * (defaults to `docs` itself — self-perplexity, the "how typical
    * of this corpus is this document" quality signal), then score. */
  def withCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                       reference: DataFrame = null,
                       hexChars: Int = 3): DataFrame =
    scoreCrossEntropy(docs, idCol, textCol,
      fitCrossEntropyModel(Option(reference).getOrElse(docs),
        idCol, textCol, hexChars))

  /** The resampling step: keep `k` documents by Gumbel-top-k over
    * `weight / temperature` — equivalent to sampling k WITHOUT
    * replacement with probability proportional to
    * exp(weight/temperature), but fully deterministic: the Gumbel
    * noise is keyed on the document's content hash (the same md5
    * mechanism as [[Sampling.deterministicSample]]), so the selected
    * set is a pure function of the data — reproducible across runs,
    * engines and partitionings. `temperature = 0` degenerates to plain
    * top-k by weight; large temperatures approach uniform sampling.
    *
    * Scale shape: one map-side score column, then TakeOrdered
    * (per-partition heaps + a k-row driver merge) — never a full
    * sort. */
  def resampleTopK(docs: DataFrame, key: Column, weight: Column, k: Int,
                   temperature: Double = 1.0, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature >= 0.0, "temperature must be non-negative")
    // u in (0,1): (32-bit content hash + 0.5) / 2^32
    val u = (conv(Sampling.sampleHash(key, salt), 16, 10).cast("double") + 0.5) /
      4294967296.0
    val gumbel = -log(-log(u))
    val score = if (temperature == 0.0) weight
                else weight / temperature + gumbel
    graft.ops.Kernels.topK(docs.withColumn("__dsir_score", score),
        Seq(col("__dsir_score").desc, key.asc), k)
      .drop("__dsir_score")
  }

  /** Per-group KL divergence of the group's Laplace-smoothed
    * hashed-gram bucket distribution from the CORPUS-wide one —
    * distribution drift as a number: "is this source / crawl shard /
    * ingest day statistically unlike the rest of the corpus?" (the
    * monitoring twin of [[withImportanceWeights]], which RANKS
    * documents toward a target; this SCORES groups against the
    * whole).
    *
    * KL(P_g ‖ P_c) = Σ_b p_gb · ln(p_gb / p_cb) over ALL 16^hexChars
    * buckets, with p_xb = (c_xb + 1) / (n_x + m). Absent buckets
    * still contribute (their smoothed mass is not zero), so the sum
    * runs over the full groups × buckets grid — m·|groups| rows, a
    * driver-free generated frame, NOT a corpus-sized one. Scale
    * shape: one gram pass collapses map-side to the (group, bucket)
    * counts (≤ m rows per group); everything after is arithmetic on
    * model-sized tables.
    *
    * Returns (groupCol, n_grams, kl) with kl UNROUNDED (consumers
    * round; bucket-sum order commutes only at ulp level).
    */
  def bucketKl(docs: DataFrame, idCol: String, textCol: String,
               groupCol: String, hexChars: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val m = math.pow(16, hexChars).toLong
    val occ = gramOccurrences(docs, idCol, textCol, Seq(col(groupCol)))
      .select(col(groupCol), bucketOf(col("__gram"), hexChars).as("bk"))
    val gc = graft.ops.Staging.stage(
      occ.groupBy(groupCol, "bk").agg(count(lit(1)).as("c")))
    val gt = gc.groupBy(groupCol).agg(sum("c").as("ng"))
    val cb = gc.groupBy("bk").agg(sum("c").as("cbv"))
    val ct = gc.agg(sum("c").as("n"))
    val buckets = spark.range(0, m)
      .select(lower(lpad(hex(col("id")), hexChars, "0")).as("bk"))
    val grid = gc.select(groupCol).distinct().crossJoin(buckets)
    val f = grid
      .join(gc, Seq(groupCol, "bk"), "left")
      .join(broadcast(cb), Seq("bk"), "left")
      .select(col(groupCol), col("bk"),
              coalesce(col("c"), lit(0L)).as("c"),
              coalesce(col("cbv"), lit(0L)).as("cbv"))
    val mD = lit(m.toDouble)
    val pG = (col("c") + lit(1.0)) / (col("ng") + mD)
    val pC = (col("cbv") + lit(1.0)) / (col("n") + mD)
    f.join(broadcast(gt), Seq(groupCol)).crossJoin(broadcast(ct))
      .withColumn("__t", pG * log(pG / pC))
      .groupBy(col(groupCol), col("ng").as("n_grams"))
      .agg(sum("__t").as("kl"))
      .select(col(groupCol), col("n_grams"), col("kl"))
  }

  /** Per-vocab-term KL contribution in floored nano-nats — SHARED
    * text (q331's oracle interpolates the same string): p*ln(p/q)
    * with Laplace(+1) smoothing, the log argument as a ratio of
    * DOUBLE-cast products (integer products would overflow at corpus
    * scale), every literal explicit. */
  private[graft] val KlTermNano =
    "CAST(floor(CAST(1000000000 AS DOUBLE) * " +
      "(CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)) * " +
      "ln((CAST(ca + 1 AS DOUBLE) * CAST(nb + v AS DOUBLE)) / " +
      "(CAST(cb + 1 AS DOUBLE) * CAST(na + v AS DOUBLE)))) AS BIGINT)"

  /** Pairwise SOURCE-LM KL divergence matrix — KL(P_a || P_b) between
    * every ordered source pair's Laplace(+1)-smoothed unigram LMs
    * over the (possibly CUT) joint vocabulary: the directional
    * corpus-shift measure behind "which source least represents
    * which". Per-term contributions are floored nano-nats
    * ([[KlTermNano]] — no float sum-order hazard).
    *
    * Scale shape and the VOCABULARY VALVE (r17 verdict item 6): after
    * the one corpus token scan, every frame is bounded by
    * sources × |V| rows — and on a web corpus the raw joint
    * vocabulary is 10⁸–10⁹ terms, so the grid itself becomes the
    * cost. `minCount` drops terms whose GLOBAL count is below the
    * floor (hapaxes are most of any web vocabulary and contribute
    * O(1/n ln n) each); `topV` keeps only the V globally-most-
    * frequent terms (ties to the lexicographically smaller — a total
    * deterministic order). Both default to "no cut". The smoothed
    * LMs are then over the cut vocabulary (v = |cut|), the standard
    * truncated-vocab LM convention. The sources frame is tiny by
    * construction and broadcast into the grid cross join; the
    * per-term left join and the pair join shuffle on the term key.
    *
    * Returns (source_a, source_b, n_terms, kl_nano), one row per
    * ordered pair. */
  def sourceKlMatrix(docs: DataFrame, sourceCol: String, textCol: String,
                     minCount: Long = 1L,
                     topV: Option[Int] = None): DataFrame = {
    require(minCount >= 1L, "minCount must be >= 1")
    topV.foreach(v => require(v >= 1, "topV must be >= 1"))
    val toks = docs
      .select(col(sourceCol).as("source"),
              explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = graft.ops.Staging.stage(
      toks.groupBy("source", "w").agg(count(lit(1)).as("c")))
    // vocabulary valve: one term-keyed aggregate (same exchange the
    // un-cut distinct paid), then the optional top-V total-order cut
    val gcounts = counts.groupBy("w").agg(sum("c").as("__gc"))
      .filter(col("__gc") >= minCount)
    val vocab = topV match {
      case Some(vmax) => gcounts
        .orderBy(col("__gc").desc, col("w")).limit(vmax).select("w")
      case None => gcounts.select("w")
    }
    val vAgg = vocab.agg(count(lit(1)).as("v"))
    val totals = counts.groupBy("source").agg(sum("c").as("n"))
    val grid = graft.ops.Staging.stage(
      vocab.crossJoin(broadcast(totals))
        .join(counts, Seq("source", "w"), "left")
        .select(col("source"), col("w"), col("n"),
          coalesce(col("c"), lit(0L)).as("c")))
    val a = grid.select(col("source").as("source_a"), col("w"),
      col("n").as("na"), col("c").as("ca"))
    val b = grid.select(col("source").as("source_b"), col("w").as("__w"),
      col("n").as("nb"), col("c").as("cb"))
    a.join(b, col("w") === col("__w") && col("source_a") =!= col("source_b"))
      .crossJoin(broadcast(vAgg))
      .select(col("source_a"), col("source_b"), expr(KlTermNano).as("__t"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_terms"), sum("__t").as("kl_nano"))
  }
}
