package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data pipelines.
  *
  * `sample(fraction)` with a random seed is reproducible only for a
  * fixed partitioning of a fixed file layout — repartition the corpus
  * (or re-shard it upstream) and the sample changes. Keying the
  * decision on row CONTENT instead makes the sample a pure function
  * of the data: the same document is kept or dropped in every run, on
  * every engine, under any partitioning — the property that makes
  * corpus subsamples auditable and experiments rerunnable.
  *
  * Mechanism: the first 8 hex chars of md5(key || salt) are a uniform
  * 32-bit value; a row is kept iff that HEX STRING is
  * lexicographically below the fraction's 8-hex-digit threshold
  * (fixed-width lowercase hex compares identically to its numeric
  * value, so the filter is a plain string comparison any engine —
  * including the DuckDB oracle — evaluates bit-identically). The salt
  * decorrelates different samples over the same corpus. Map-side
  * filter, no shuffle; pushes to the scan where md5 of a scanned
  * column allows.
  */
object Sampling {

  /** 8-hex-digit threshold for a fraction of the 32-bit hash space. */
  private[ext] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    f"${math.round(fraction * 4294967296.0).min(4294967296L)}%08x" match {
      case s if s.length > 8 => "ffffffff~" // fraction 1.0: above every hash
      case s => s
    }
  }

  /** The keep-decision hash: first 8 hex chars of md5(key || salt). */
  def sampleHash(key: Column, salt: String = ""): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Keep ~fraction of rows, decided by content hash of `key`. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          salt: String = ""): DataFrame =
    df.filter(sampleHash(key, salt) < lit(thresholdHex(fraction)))

  /** Deterministic train/val/test fold assignment: each row gets the
    * label of the hash range its content hash falls in, with range
    * widths proportional to the fold weights (which must sum to 1).
    * Same auditability properties as [[deterministicSample]]: a
    * document's fold is a pure function of its key — stable across
    * runs, engines, partitionings and corpus growth (adding documents
    * never moves an existing one between folds, the property that
    * keeps eval sets leak-free as the corpus is re-crawled). Map-side
    * `when` chain over cumulative thresholds; no shuffle.
    */
  def withFold(df: DataFrame, key: Column, folds: Seq[(String, Double)],
               salt: String = "", out: String = "fold"): DataFrame = {
    require(folds.nonEmpty && folds.forall(_._2 > 0.0),
      "folds must be non-empty with positive weights")
    require(math.abs(folds.map(_._2).sum - 1.0) < 1e-9,
      "fold weights must sum to 1")
    val h = sampleHash(key, salt)
    val cum = folds.scanLeft(0.0)(_ + _._2).tail
    // last fold catches everything (its threshold sorts above any hash)
    val expr = folds.zip(cum).init.foldRight(lit(folds.last._1)) {
      case (((label, _), c), acc) => when(h < lit(thresholdHex(c)), label).otherwise(acc)
    }
    df.withColumn(out, expr)
  }

  /** LEAKAGE-SAFE fold split: near-duplicate CLUSTERS are assigned to
    * folds atomically, so no near-dup pair ever straddles train/test —
    * the eval-contamination hole a row-hash split ([[withFold]]) leaves
    * open whenever the corpus still carries near-dups (a test doc's
    * near-twin in train inflates every eval metric; cf. the
    * deduplicate-before-split practice in Lee et al. 2022,
    * arXiv:2107.06499 §6). `pairs` is any near-dup edge list (exact
    * Jaccard, MinHash-LSH, SimHash — the [[graft.ext.Dedup]]
    * generators); nodes absent from it are their own singleton
    * cluster. The fold hash keys on the CLUSTER representative (the
    * component's min id), so the assignment stays a pure function of
    * the data with [[withFold]]'s auditability, and docs of one
    * cluster land together by construction.
    *
    * Scale shape: connected components over the edge list (banded
    * near-dup edges are a sliver of the corpus — see
    * [[Dedup.connectedComponents]]'s adaptive gate), one left join of
    * the corpus against the node-sized component table, map-side fold
    * hash. Adds `cluster` and `fold`. */
  def leakageSafeFolds(df: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String,
                       folds: Seq[(String, Double)],
                       salt: String = ""): DataFrame = {
    // cluster/fold are this operator's outputs; an input frame already
    // carrying them would be silently shadowed (cutBoilerplate's
    // reserved-column contract, r16 advice). The component frame's own
    // id/component columns are renamed to __-temporaries before the
    // join so an input column named id or component cannot make the
    // unqualified select below AMBIGUOUS_REFERENCE.
    val clash = Seq("cluster", "fold").filter(df.columns.contains)
    require(clash.isEmpty,
      s"leakageSafeFolds reserves output columns ${clash.mkString(", ")} — rename them upstream")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as("__lsf_id"), col("component").as("__lsf_comp"))
    val clustered = df.join(comp, df(idCol) === col("__lsf_id"), "left")
      .select(df.columns.map(df(_)) :+
        coalesce(col("__lsf_comp"), df(idCol)).as("cluster"): _*)
    withFold(clustered, col("cluster"), folds, salt)
  }

  /** Resample a corpus toward a target DOMAIN MIXTURE under a total
    * row budget — the data-mixing step of training-corpus assembly
    * ("30% web, 30% code, 40% books" against whatever the crawl
    * actually contains). Each domain's keep fraction is
    * `budget * share / count(domain)` clamped to 1: downsampling
    * only, so a domain too small to fill its share keeps everything
    * rather than replicating rows (the achieved mixture then reports
    * the shortfall instead of hiding it). Domains absent from
    * `targetShares` are dropped. Membership is the same content-keyed
    * hash as [[deterministicSample]], so the resampled corpus is a
    * pure function of the data — identical across runs, engines and
    * partitionings, and shrinking the budget yields a SUBSET of the
    * larger sample (nested subsamples, the property that makes
    * scaling-law token ladders comparable).
    *
    * Scale shape: one tiny domains-sized aggregate collected to the
    * driver (the fractions become plan-time constants, like IVF's
    * centroid table), then one map-side filter over the corpus — no
    * shuffle of the data itself. */
  def mixtureResample(df: DataFrame, key: Column, domain: Column,
                      targetShares: Map[String, Double], totalBudget: Long,
                      salt: String = ""): DataFrame =
    mixtureResample(df, key, domain, targetShares, totalBudget, salt, lit(1L))

  /** Weighted variant: budget and shares are in `weight` units —
    * pass a token-count column and the mixture targets TOKEN shares,
    * the unit training budgets are actually written in. Weights must
    * be non-negative integers (their exact sum per domain drives the
    * fraction); the keep decision is still whole-document, so the
    * achieved token share wobbles by at most one document per
    * domain boundary. */
  def mixtureResample(df: DataFrame, key: Column, domain: Column,
                      targetShares: Map[String, Double], totalBudget: Long,
                      salt: String, weight: Column): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0.0),
      "target shares must be positive")
    require(math.abs(targetShares.values.sum - 1.0) < 1e-9,
      "target shares must sum to 1")
    require(totalBudget > 0, "totalBudget must be positive")
    // exact long sums (no float order-dependence), tiny result set
    val counts = df.groupBy(domain.cast("string").as("__domain"))
      .agg(sum(weight.cast("long")).as("__cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // (budget * share) / count, evaluated in exactly this IEEE order —
    // the DuckDB oracle writes the same literals in the same order, so
    // the fraction (and its thresholdHex) match bit-for-bit
    val fractions = targetShares.flatMap { case (dom, share) =>
      counts.get(dom).filter(_ > 0L)
        .map(cnt => dom -> math.min(1.0, totalBudget * share / cnt))
    }
    stratifiedSample(df, key, domain, fractions, defaultFraction = 0.0, salt)
  }

  /** Stratified variant: per-stratum fractions (default for strata
    * not listed). One map-side filter; no shuffle, no per-stratum
    * passes. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (s, f)) => when(stratum === s, thresholdHex(f)).otherwise(acc)
    }
    df.filter(sampleHash(key, salt) < threshold)
  }

  /** Exactly-k-per-group weighted sampling WITHOUT replacement —
    * Efraimidis & Spirakis (2006): each row draws priority u^(1/w)
    * from a uniform u and the k largest priorities per group are the
    * sample (selection probability proportional to weight, sample
    * size exact — [[mixtureResample]] hits a token BUDGET instead but
    * only in expectation). Deterministic twist: u is derived from
    * content, not a PRNG — the first 13 md5 hex chars of (key‖salt)
    * are a 52-bit integer h, and u = (h + 0.5) / 2^52. Both h (< 2^52)
    * and the division (by a power of two) are EXACT doubles, so any
    * engine reconstructs the identical u; rows are ranked on the
    * monotone-equivalent ln(u)/w (descending), dodging pow(u, 1/w)'s
    * cross-engine rounding.
    *
    * Scale shape: one map-side md5 pass, then top-k per group. The
    * rank window shuffles once on the group key. Rows with weight ≤ 0
    * are DROPPED, explicitly: E-S priorities are defined over positive
    * weights only (a zero weight would divide ln(u) to -inf), and a
    * zero-token document carries nothing worth sampling.
    *
    * The output carries `priority_h` — the exact 52-bit integer h,
    * NOT the transcendental ln(u)/w: JVM Math.log and other libms can
    * differ by an ulp, so any emitted function of ln is hash-fragile
    * across engines even after rounding. h is a pure integer every
    * engine reproduces bit-for-bit.
    *
    * Residual cross-engine sensitivity (documented, not fixed): the
    * RANKING itself still compares ln(u)/w doubles, so two rows whose
    * priorities differ by ~1 ulp could in principle swap sides of the
    * rank-k boundary on an engine whose libm rounds ln differently.
    * For content-hashed u this needs two independent md5-derived
    * priorities within ~2^-52 relative distance AT the boundary —
    * negligible for real draws, and no integer-exact monotone
    * surrogate exists for general weights (u^(w2) cross-comparisons
    * overflow any fixed-width integer domain). Callers needing a
    * hard guarantee should treat the SELECTED SET, not the rank
    * order, as the contract — the q107 oracle does.
    */
  def weightedSampleK(df: DataFrame, key: Column, weight: Column,
                      groupCol: String, k: Int,
                      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val h = conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 13),
                 16, 10).cast("long")
    val u = (col("priority_h").cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52 — exact double division
    df.filter(weight.cast("double") > 0)
      .withColumn("priority_h", h)
      .withColumn("__pri", log(u) / weight.cast("double"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(groupCol)
          .orderBy(col("__pri").desc, key.cast("string"))))
      .filter(col("rnk") <= k)
      .drop("__pri")
  }

  /** Deterministic train/val/test split — the content-keyed form of
    * `randomSplit`: each row lands in the named slice whose cumulative
    * hash-fraction band contains md5(key‖salt). Pure function of the
    * data (same doc → same split in every run, on every engine, under
    * any partitioning — the property that keeps eval sets
    * uncontaminated across pipeline re-runs), map-side, no shuffle.
    * Fractions must sum to 1 within 1e-9; the LAST slice absorbs the
    * hash-space remainder so the bands are exhaustive.
    */
  def hashSplit(df: DataFrame, key: Column,
                fractions: Seq[(String, Double)],
                salt: String = "", out: String = "split"): DataFrame =
    // identical band semantics to withFold (cumulative thresholdHex
    // when-chain, last slice absorbs the remainder) — one
    // implementation, two vocabulary entry points (ADVICE r11: two
    // parallel copies of the split arithmetic can drift)
    withFold(df, key, fractions, salt, out)

  /** Deterministic negative sampling for contrastive-pair generation:
    * each row draws `negsPerDoc` pseudo-random OTHER rows; the draw is
    * md5-derived (the same exact-52-bit-integer move as
    * [[weightedSampleK]]) so pairs are a pure function of the corpus.
    *
    * Indices land in DENSE POSITION space —
    * [[graft.ops.Kernels.denseIndex]]'s rank of `idCol` in sorted
    * order — never against the id value itself, so sparse Long ids and
    * string ids sample correctly (an id-space draw silently samples
    * nothing once ids aren't exactly 0..n-1). Self-collisions bump to
    * the next position mod n, so no row ever pairs with itself.
    *
    * Output: the input row's columns plus `j` (0-based draw index) and
    * `neg_id` (the sampled row's `idCol`). Shape at scale: one staged
    * index pass, a map-side draw, and one shuffle join
    * (position → negative id); n arrives as a broadcast 1-row count.
    *
    * A 1-row corpus has no OTHER row to draw, so the self-bump cannot
    * escape (for n ≥ 2 it always does: (p+1) mod n ≠ p) — the final
    * self-filter makes that degenerate case emit zero pairs instead
    * of doc→doc garbage; it drops nothing at n ≥ 2.
    */
  def negativeSamples(df: DataFrame, idCol: String, negsPerDoc: Int,
                      salt: String = ""): DataFrame = {
    require(negsPerDoc >= 1, "negsPerDoc must be >= 1")
    val indexed = graft.ops.Staging.stage(
      graft.ops.Kernels.denseIndex(df, idCol, "__dense"))
    val n = indexed.agg(count(lit(1)).as("__n"))
    indexed.crossJoin(broadcast(n))
      .withColumn("j", explode(array((0 until negsPerDoc).map(lit(_)): _*)))
      .withColumn("__h", conv(substring(md5(concat(
          col(idCol).cast("string"), lit("|"),
          col("j").cast("string"), lit(salt))), 1, 13), 16, 10)
        .cast("long"))
      .withColumn("__raw", pmod(col("__h"), col("__n")))
      .withColumn("__negpos",
        when(col("__raw") === col("__dense"),
          pmod(col("__raw") + 1, col("__n"))).otherwise(col("__raw")))
      .join(indexed.select(col("__dense").as("__negpos"),
                           col(idCol).as("neg_id")), "__negpos")
      .filter(col("neg_id") =!= col(idCol)) // no-op for n >= 2 (see above)
      .drop("__negpos", "__dense", "__n", "__h", "__raw")
  }
}
