package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — the record-linkage pipeline
  * assembled from this library's primitives: a blocking key bounds
  * the candidate space, the native codegen'd Jaro-Winkler expression
  * scores candidate pairs, pairs at or above the match threshold
  * become edges, and connected components (min-label) produce one
  * cluster id per entity. The reference engine has no fuzzy-matching
  * surface; this is a pure extension operator in the 100-TB-pipeline
  * family (vendor/master-data dedup, author disambiguation,
  * crawl-source canonicalization).
  *
  * Scale shape — two independent bounds keep the pair join from ever
  * going quadratic in corpus size:
  *
  *  1. '''Distinct-name comparison space.''' Similarity depends only
  *     on the name string, so rows are first collapsed to distinct
  *     (block, name) groups (one aggregate; `rep` = min member id,
  *     `c` = multiplicity) and only DISTINCT names are ever paired.
  *     Exact duplicates — the dominant case in real master data —
  *     cluster structurally through their shared name group and cost
  *     ZERO comparisons: a corpus where names repeat k× on average
  *     pays (D/k)² of the naive row-level pair bill. Same-name rows
  *     therefore always cluster, regardless of any cap below.
  *  2. '''Block-occupancy guard''' (`maxBlockNames`, the
  *     [[Similarity]] `maxBandBucket` discipline): a block holding
  *     more than `maxBlockNames` DISTINCT names is deterministically
  *     sub-blocked by a hash of the name into ceil(d/maxBlockNames)
  *     buckets, and cross-name pairs generate only within a bucket.
  *     Pairs per block are thus O(d · maxBlockNames) — linear in the
  *     number of distinct names — instead of O(d²). The documented
  *     approximation: when the guard actually splits a block, a
  *     cross-name match pair survives only if both names hash to the
  *     same sub-bucket; same-name clustering is NEVER affected (bound
  *     1 handles it before pairing). An oversized block signals a
  *     non-discriminative blocking key — the cap makes that a graceful
  *     recall degradation instead of an executor-killing shuffle, and
  *     the right fix remains a better key (more prefix tokens, an LSH
  *     bucket: [[Similarity.lshNearDupPairs]]).
  *
  * After pairing: one exchange on the blocking key, the scored-pair
  * frame staged once, then the adaptive CC (driver union-find under
  * the size gate, O(log diameter) label sweeps above it). The
  * threshold comparison is bit-safe cross-engine because the JW
  * kernel is pinned to the rapidfuzz-lineage IEEE operation order
  * (see [[graft.functions.JaroWinklerKernel]]).
  */
object EntityRes {

  /** Default cap on distinct names compared within one block. At the
    * default, a block's candidate pairs are bounded by d·10⁴ instead
    * of d² — a block that trips it is already mis-keyed (10k distinct
    * near-identical spellings under one key), so the cap is a
    * backstop, not a tuning knob. */
  val DefaultMaxBlockNames: Int = 10000

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Warn-on-breach check, run when candidate pairs are BUILT: count
    * the blocks whose distinct-name occupancy exceeds the cap (i.e.
    * that [[candidateNamePairs]] will sub-bucket) and, if any, log a
    * warning and RETURN the breach as (names in split blocks, max
    * sub-bucket count) — so graceful recall degradation is
    * distinguishable from full recall (r13 advice). Per-call, not
    * process-global: the r14 shape recorded into a shared
    * AtomicReference, which concurrent resolves clobbered (r14
    * advice); callers that want the signal take it from
    * [[resolveSignaled]]'s return value.
    * The check is one tiny aggregate over the per-block occupancy
    * frame — bounded by block count, never corpus rows — evaluated
    * eagerly and synchronously (an async observe metric would vanish
    * under the callers' persist boundaries). Since callers stage the
    * name-group frame before pairing, this pass doubles as the cache
    * warm-up for the self-join that follows. */
  private def occupancySignal(occ: DataFrame,
                              maxBlockNames: Int): Option[(Long, Long)] = {
    val r = occ.filter(col("__d") > maxBlockNames)
      .agg(coalesce(sum("__d"), lit(0L)).as("names"),
           coalesce(max(ceil(col("__d").cast("double") /
             lit(maxBlockNames.toDouble))), lit(0L)).as("max_sub"))
      .head()
    val names = r.getAs[Number](0).longValue
    val maxSub = r.getAs[Number](1).longValue
    if (names > 0) {
      log.warn(
        s"EntityRes occupancy guard engaged: $names distinct names sit in " +
          s"blocks over the $maxBlockNames cap, split into up to $maxSub " +
          "sub-buckets — cross-name recall degrades there (same-name " +
          "clustering unaffected); the blocking key is non-discriminative, " +
          "consider more prefix tokens or an LSH block")
      Some((names, maxSub))
    } else None
  }

  /** Distinct-name groups of `df`: one row per (block, name) with
    * `__rep` = min member id (the group's representative — min over
    * reps of a merged cluster is min over all member ids) and `__c` =
    * multiplicity. The collapse step both [[resolve]] and the driver
    * audit queries (q173/q179) build on: every downstream comparison
    * count is a function of DISTINCT names, never of row count. */
  def nameGroups(df: DataFrame, idCol: String, nameCol: String,
                 blockCol: Column): DataFrame =
    df.select(col(idCol).as("__id"), col(nameCol).as("__nm"),
              blockCol.as("__blk"))
      .groupBy("__blk", "__nm")
      .agg(min("__id").as("__rep"), count(lit(1)).as("__c"))

  /** Scored cross-name candidate pairs over staged [[nameGroups]]
    * output, with the occupancy guard applied: (__blk, __nma, __nmb,
    * __repa, __repb, __ca, __cb, jw) for every in-(sub-)block pair of
    * DISTINCT names (ordered `__nma < __nmb`; jw unfiltered —
    * callers threshold). Package-visible so the spec can measure the
    * occupancy bound directly. */
  private[graft] def candidateNamePairs(names: DataFrame,
                                        maxBlockNames: Int): DataFrame =
    candidateNamePairsSignaled(names, maxBlockNames)._1

  /** [[candidateNamePairs]] plus the per-call occupancy-breach signal
    * (None when no block was split). */
  private[graft] def candidateNamePairsSignaled(
      names: DataFrame, maxBlockNames: Int)
      : (DataFrame, Option[(Long, Long)]) = {
    require(maxBlockNames >= 2, "maxBlockNames must be >= 2")
    val spark = names.sparkSession
    val occ = names.groupBy("__blk").agg(count(lit(1)).as("__d"))
    val breach = occupancySignal(occ, maxBlockNames)
    val sub = names.join(occ, "__blk")
      .withColumn("__nsub",
        ceil(col("__d").cast("double") / lit(maxBlockNames.toDouble)))
      .withColumn("__sub", pmod(xxhash64(col("__nm")), col("__nsub")))
    val a = sub.select(col("__blk"), col("__sub"),
      col("__nm").as("__nma"), col("__rep").as("__repa"),
      col("__c").as("__ca"))
    val b = sub.select(col("__blk"), col("__sub"),
      col("__nm").as("__nmb"), col("__rep").as("__repb"),
      col("__c").as("__cb"))
    (a.join(b, Seq("__blk", "__sub")).filter(col("__nma") < col("__nmb"))
      .withColumn("jw", graft.functions.GraftFunctions
        .jaroWinkler(spark, col("__nma"), col("__nmb"))),
     breach)
  }

  /** GENERIC within-block pair generator with the occupancy valve —
    * the [[candidateNamePairsSignaled]] sub-bucketing scheme lifted
    * off the name-group schema so any blocked pairwise operator
    * (Fellegi-Sunter m/u estimation, q358/q359) rides the same
    * quadratic-growth backstop. Within-block pair count is quadratic
    * in block occupancy — the standard record-linkage trade — so
    * blocks larger than `maxBlockSize` rows are hash-split on
    * `idCol` into ceil(d / maxBlockSize) sub-buckets and pairs form
    * only within a sub-bucket: the comparison bill drops from
    * Σ_b C(d_b, 2) to Σ_b Σ_s C(d_bs, 2) with E[d_bs] <= cap —
    * linear in d_b at fixed cap — at the cost of cross-sub-bucket
    * recall in the split blocks only (signaled, never silent; the
    * maxDocFreq/maxFpDocs valve convention).
    *
    * Returns every non-block column twice, suffixed `_a`/`_b`, with
    * `idCol_a < idCol_b` (the canonical pair order); unsplit blocks
    * produce EXACTLY the plain block self-join's pairs, so a caller
    * whose blocks sit under the cap (the default at every tested SF
    * for q358/q359) is bit-identical to the uncapped form and its
    * oracle replays the plain block join. */
  def blockedPairs(df: DataFrame, blockCol: String, idCol: String,
                   maxBlockSize: Int = DefaultMaxBlockNames): DataFrame =
    blockedPairsSignaled(df, blockCol, idCol, maxBlockSize)._1

  /** [[blockedPairs]] plus the per-call occupancy-breach signal
    * (None when no block was split), the [[resolveSignaled]]
    * convention. `df` should be staged by the caller — it fans out
    * to the occupancy count and both sides of the self-join. */
  def blockedPairsSignaled(df: DataFrame, blockCol: String, idCol: String,
                           maxBlockSize: Int = DefaultMaxBlockNames)
      : (DataFrame, Option[(Long, Long)]) = {
    require(maxBlockSize >= 2, "maxBlockSize must be >= 2")
    val reserved = df.columns.filter(Set("__d", "__nsub", "__sub").contains)
    require(reserved.isEmpty,
      s"df carries reserved working column(s) ${reserved.mkString(", ")} — " +
        "rename them before blockedPairs")
    val occ = df.groupBy(blockCol).agg(count(lit(1)).as("__d"))
    val breach = occupancySignal(occ, maxBlockSize)
    val sub = df.join(occ, blockCol)
      .withColumn("__nsub",
        ceil(col("__d").cast("double") / lit(maxBlockSize.toDouble)))
      .withColumn("__sub",
        pmod(xxhash64(col(idCol).cast("string")), col("__nsub")))
    val others = df.columns.filterNot(_ == blockCol).toSeq
    val a = sub.select(col(blockCol) +: col("__sub") +:
      others.map(c => col(c).as(s"${c}_a")): _*)
    val b = sub.select(col(blockCol) +: col("__sub") +:
      others.map(c => col(c).as(s"${c}_b")): _*)
    (a.join(b, Seq(blockCol, "__sub"))
       .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
       .drop("__sub"),
     breach)
  }

  /** Sorted-neighborhood candidate pairs (Hernández–Stolfo): order
    * the DISTINCT names globally and compare each to its next
    * `window` neighbors — the classic alternative to key blocking
    * when no discriminative key exists. Candidate count is EXACTLY
    * d·window (d = distinct names): linear by construction, no
    * occupancy guard needed. Distributed via [[graft.ops.Kernels
    * .denseIndex]] (range-partitioned total index, never a global
    * single-partition window) and a bucket band join: neighbor pairs
    * live in the same or adjacent `index div window` bucket, so the
    * self-join is an equi-join on the bucket key with an index-delta
    * filter — one bounded exchange. Returns (__nma, __nmb, __repa,
    * __repb, __ca, __cb, jw) with `__nma` the earlier name in sort
    * order; callers threshold on `jw`.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              nameCol: String, window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    val names = graft.ops.Staging.stage(
      nameGroups(df, idCol, nameCol, lit("all")))
    val idx = graft.ops.Staging.stage(
      graft.ops.Kernels.denseIndex(names, Seq(col("__nm")), "__i")
        .withColumn("__bkt", expr(s"__i div $window")))
    val a = idx.select(col("__bkt"), col("__i").as("__ia"),
      col("__nm").as("__nma"), col("__rep").as("__repa"),
      col("__c").as("__ca"))
    val b = idx.select(explode(array(col("__bkt"), col("__bkt") - 1))
        .as("__bkt"),
      col("__i").as("__ib"), col("__nm").as("__nmb"),
      col("__rep").as("__repb"), col("__c").as("__cb"))
    a.join(b, Seq("__bkt"))
      .filter(col("__ib") > col("__ia") &&
        col("__ib") <= col("__ia") + window)
      .select(col("__nma"), col("__nmb"), col("__repa"), col("__repb"),
        col("__ca"), col("__cb"),
        graft.functions.GraftFunctions
          .jaroWinkler(spark, col("__nma"), col("__nmb")).as("jw"))
  }

  /** Cluster rows whose `nameCol` matches within a block at
    * `threshold` Jaro-Winkler similarity or above. Returns
    * (id, component): one row per entity that participates in at
    * least one match pair; min member id labels the cluster.
    * Singletons (no match) are absent — callers left-join and
    * coalesce to self-label, the [[Dedup.connectedComponents]]
    * convention. Same-name rows always co-cluster (jw(x,x)=1 ≥ any
    * valid threshold) through their name group — no pair is
    * generated or capped for them; only cross-name matching is
    * subject to `maxBlockNames` (see the object scaladoc).
    */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
              blockCol: Column, threshold: Double,
              maxBlockNames: Int = DefaultMaxBlockNames): DataFrame =
    resolveSignaled(df, idCol, nameCol, blockCol, threshold,
      maxBlockNames)._1

  /** [[resolve]] plus the per-call occupancy-breach signal: (labels,
    * Some((names in split blocks, max sub-bucket count))) when the
    * guard sub-bucketed at least one over-cap block — i.e. cross-name
    * recall degraded there — else None. Returned per call rather than
    * recorded in shared state, so concurrent resolves can't clobber
    * each other's signal (r14 advice). */
  def resolveSignaled(df: DataFrame, idCol: String, nameCol: String,
                      blockCol: Column, threshold: Double,
                      maxBlockNames: Int = DefaultMaxBlockNames)
      : (DataFrame, Option[(Long, Long)]) = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    // staged: consumed by the pair join (twice, self-join), the
    // occupancy count, and the label expansion
    val names = graft.ops.Staging.stage(
      nameGroups(df, idCol, nameCol, blockCol))
    val (cand, breach) = candidateNamePairsSignaled(names, maxBlockNames)
    val pairs = graft.ops.Staging.stage(
      cand.filter(col("jw") >= threshold)
        .select(col("__repa").as("id_a"), col("__repb").as("id_b")))
    // rep-level components; min over reps = min over member ids
    val comp = Dedup.connectedComponents(pairs)
    val lab = names
      .join(comp.withColumnRenamed("id", "__rep"), Seq("__rep"), "left")
      .select(col("__blk"), col("__nm"),
        coalesce(col("component"), col("__rep")).as("__comp"),
        (col("__c") >= 2 || col("component").isNotNull).as("__part"))
    (df.select(col(idCol).as("__id"), col(nameCol).as("__nm"),
               blockCol.as("__blk"))
      .join(lab, Seq("__blk", "__nm"))
      .filter(col("__part"))
      .select(col("__id").as("id"), col("__comp").as("component")),
     breach)
  }
}
