package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches. Spark's own `approx_count_distinct` is
  * HLL++ with an engine-private hash — correct, but unverifiable from
  * outside. This HyperLogLog (Flajolet et al. 2007, with the standard
  * small-range linear-counting correction) is built on md5, so the
  * ENTIRE sketch — bucket, rank, registers, estimate — is replayable
  * in any engine with md5 and the estimate is hash-comparable
  * cross-engine, the property every other operator here gets from its
  * oracle. Use it when the distinct count itself must be auditable;
  * use `approx_count_distinct` when it doesn't.
  */
object Sketches {

  /** Approximate distinct `valueCol` per `groupCol` via a
    * 2^p-register HLL. Returns (groupCol, n_buckets, hll_distinct)
    * with the estimate UNROUNDED (consumers round; it is a double).
    *
    * Construction (all portable string/int arithmetic on md5 hex):
    * bucket = first p/4 hex chars; rank = leading-zero bits of the
    * NEXT 13 hex chars (a 52-bit window) + 1, capped at 53.
    * Register = max(rank) per (group, bucket).
    *
    * Estimate: `E = alpha_m * m * m / S` where S sums `2^-register`
    * over all m registers (absent buckets contribute 2^0 = 1), with
    * the small-range correction `m * ln(m / V)` when V (= zero
    * registers) > 0 and E <= 2.5m. The 2^-M terms are built from an
    * integer shift, not `pow` — exact powers of two in both engines.
    *
    * Scale shape: one map-side md5 pass, one aggregate to m rows per
    * group, one aggregate to 1 row per group. The sketch property
    * that matters at 100 TB: REPEATED values cost nothing (max of
    * equal ranks), so the shuffle carries at most m rows per group
    * regardless of corpus size — this is the cardinality path when
    * countDistinct's exact shuffle would not fit.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, valueCol, p), groupCol, p)

  /** The register table alone: (groupCol, __b, __m) with one row per
    * TOUCHED bucket. Split out from [[hllDistinct]] because registers
    * are the maintainable form — they merge by per-bucket max
    * ([[SketchStore]] with merge="max"), maintain incrementally under
    * streaming aggregation (max never retracts), and the estimate is
    * a cheap read-side fold over ≤ 2^p rows. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   p: Int = 8): DataFrame = {
    require(p % 4 == 0 && p >= 4 && p <= 16,
      "p must be a multiple of 4 in [4, 16] so the bucket is whole hex chars")
    val h = md5(col(valueCol).cast("string"))
    val w = substring(h, p / 4 + 1, 13)
    val z = length(regexp_extract(w, "^0*", 0))
    val c = w.substr(z + lit(1), lit(1))
    val bits = when(c === "1", 3)
      .when(c.isin("2", "3"), 2)
      .when(c.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rank = when(z === 13, lit(53)).otherwise(z * 4 + bits + 1)
    df.select(col(groupCol), substring(h, 1, p / 4).as("__b"), rank.as("__r"))
      .groupBy(groupCol, "__b").agg(max("__r").as("__m"))
  }

  /** Flajolet estimate + linear-counting correction over a
    * [[hllRegisters]] table (same p). */
  def hllEstimate(regs: DataFrame, groupCol: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    val mD = lit(m.toDouble)
    val alpha: Column = lit(0.7213) / (lit(1.0) + lit(1.079) / mD)
    regs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets"),
           // Column-typed shift count needs the SQL form — the Scala
           // shiftleft() overload only takes a literal Int count
           sum(lit(1.0) / expr("CAST(shiftleft(CAST(1 AS BIGINT), __m) AS DOUBLE)"))
             .as("__s"))
      .withColumn("__stot", col("__s") + (mD - col("n_buckets")) * lit(1.0))
      .withColumn("__eraw", alpha * mD * mD / col("__stot"))
      .withColumn("__v", lit(m.toLong) - col("n_buckets"))
      .withColumn("hll_distinct",
        when(col("__v") > 0 && col("__eraw") <= lit(2.5) * mD,
          mD * log(mD / col("__v").cast("double")))
          .otherwise(col("__eraw")))
      .drop("__s", "__stot", "__eraw", "__v")
  }

  /** Count-min sketch counters (Cormode & Muthukrishnan 2005) over
    * `tokenCol`: `depth` hash rows × 16^hexChars buckets. Like
    * [[hllDistinct]], the hash is an md5 hex PREFIX so the whole
    * sketch is replayable in any engine with md5 — row j's bucket for
    * token t is `substr(md5(j || '|' || t), 1, hexChars)` (the q80
    * engine-portable string-key move; no integer parsing anywhere).
    *
    * Returns (__j, __b, __c) counter rows. Counters are ADDITIVE
    * (sums commute with union), so partial aggregation collapses each
    * input partition to ≤ depth·16^hexChars rows map-side and the
    * merged sketch is bounded by that same constant regardless of
    * corpus size — the frequency path when an exact token groupBy's
    * shuffle would not fit. Guarantee: estimate ≥ true count always;
    * overshoot ≤ εN with probability 1−(1/2)^depth for ε ≈ 2.7/width.
    */
  def cmsCounters(df: DataFrame, tokenCol: String, depth: Int = 4,
                  hexChars: Int = 3): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth in [1, 8]")
    require(hexChars >= 1 && hexChars <= 8, "hexChars in [1, 8]")
    df.select(col(tokenCol).as("__t"),
              explode(array((0 until depth).map(lit(_)): _*)).as("__j"))
      .select(col("__j"), cmsBucket(col("__j"), col("__t"), hexChars).as("__b"))
      .groupBy("__j", "__b").agg(count(lit(1)).as("__c"))
  }

  /** Point-queries a CMS built by [[cmsCounters]] (same depth /
    * hexChars): appends `c_est` = min over rows j of that row's
    * counter for the probe's bucket (0 when a bucket was never
    * touched — only possible for tokens absent from the corpus).
    * The counter table is a constant ≤ depth·16^hexChars rows, so it
    * BROADCASTS; the probe side never shuffles.
    */
  def cmsLookup(probes: DataFrame, tokenCol: String, counters: DataFrame,
                depth: Int = 4, hexChars: Int = 3): DataFrame = {
    val outCols = probes.columns
    probes
      .withColumn("__j", explode(array((0 until depth).map(lit(_)): _*)))
      .withColumn("__b", cmsBucket(col("__j"), col(tokenCol), hexChars))
      .join(broadcast(counters), Seq("__j", "__b"), "left")
      .na.fill(0L, Seq("__c"))
      .groupBy(outCols.map(col): _*)
      .agg(min("__c").as("c_est"))
  }

  private def cmsBucket(j: Column, token: Column, hexChars: Int): Column =
    substring(md5(concat(j.cast("string"), lit("|"), token)), 1, hexChars)

  /** K-minimum-values rows (Bar-Yossef et al. 2002; the "theta
    * sketch"): the k smallest md5-prefix hashes of the DISTINCT
    * values of `valueCol`, as (__h hex13, __u exact uniform) rows.
    * The fourth portable sketch, and the one that supports SET
    * OPERATIONS — HLL registers union but cannot intersect; KMV
    * sketches intersect by hash equality below the combined theta
    * (see q114). u = (h + 0.5)/2^52 is exact (the q107 uniform), and
    * u-order ≡ hex-string order, so an oracle can select the same k
    * rows with a plain ORDER BY on the hex.
    *
    * Scale shape: one distinct on the 13-char hash (the only
    * shuffle), then the min-k via the [[graft.functions.TopKByScoreStr]]
    * partial aggregate on negated u — k rows per partition through
    * the exchange, never a corpus sort.
    */
  def kmvMins(df: DataFrame, valueCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    val h = substring(md5(col(valueCol).cast("string")), 1, 13)
    val hv = df.select(h.as("__h")).distinct()
    val u = (conv(col("__h"), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    hv.select(col("__h"), u.as("__u"))
      .agg(graft.functions.GraftFunctions
        .topKByScoreStr(spark, -col("__u"), col("__h"), k).as("__m"))
      .select(explode(col("__m")).as("m"))
      .select(col("m.id").as("__h"), (-col("m.score")).as("__u"))
  }

  /** Distinct-count estimate as an AGGREGATE column over a
    * [[kmvMins]] table: (k−1)/u_k when the sketch is full, the EXACT
    * count when fewer than k distinct values exist (the sketch then
    * IS the distinct hash set). Use inside `.agg(...)`. */
  def kmvDistinct(k: Int = 64): Column = {
    require(k >= 2, "k must be >= 2")
    when(count(lit(1)) < k, count(lit(1)).cast("double"))
      .otherwise(lit((k - 1).toDouble) / max("__u"))
  }

  /** Fixed-width histogram counters over `valueCol` per `groupCol`:
    * bucket = floor(value / width). The third member of the portable
    * sketch family ([[hllDistinct]] cardinality, [[cmsCounters]]
    * frequency, this one QUANTILES): additive integer counters, so
    * each partition collapses map-side to one row per touched bucket
    * and the merged table is bounded by value-range/width rows per
    * group regardless of corpus size — the quantile path when an
    * exact sort (or Spark's approx_percentile, whose GK summary is
    * engine-private) must be auditable from outside.
    */
  /** `weight` generalizes the counters to WEIGHTED quantiles (e.g.
    * token-weighted document-length percentiles: "the median token
    * lives in a doc of length X"); the default 1-weight reduces to
    * plain counts. Keep weights integral for exact cross-engine
    * arithmetic. */
  def histCounters(df: DataFrame, groupCol: String, valueCol: String,
                   width: Double, weight: Column = lit(1L)): DataFrame = {
    require(width > 0.0, "width must be positive")
    df.select(col(groupCol),
              floor(col(valueCol).cast("double") / width).cast("long").as("__b"),
              weight.as("__w"))
      .groupBy(groupCol, "__b").agg(sum("__w").as("__c"))
  }

  /** Quantile estimates from a [[histCounters]] table (same width).
    * For each probe p: target rank r = ceil(p·N); the estimate is a
    * linear interpolation inside the bucket holding rank r —
    * `b·width + width·(r − cum_before)/c_b`. Every step is exact
    * integer/rational double arithmetic (no pow/ln), so the estimate
    * is bit-replayable cross-engine. The window runs over the BOUNDED
    * counter table (partitioned by group), never the corpus.
    * Returns (groupCol, p, q_est) with q_est rounded to 6dp.
    */
  def histQuantiles(counters: DataFrame, groupCol: String, width: Double,
                    ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(groupCol)
    val cum = counters
      .withColumn("__cb", coalesce(
        sum("__c").over(byGroup.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__c").over(byGroup))
    val r = ceil(col("p") * col("__n"))
    cum.select(col(groupCol), col("__b"), col("__c"), col("__cb"), col("__n"),
               explode(array(ps.map(lit(_)): _*)).as("p"))
      .filter(r > col("__cb") && r <= col("__cb") + col("__c"))
      .select(col(groupCol), col("p"),
        round(col("__b") * width +
          lit(width) * (r - col("__cb")).cast("double") / col("__c"), 6)
          .as("q_est"))
  }
}
