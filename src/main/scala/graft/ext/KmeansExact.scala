package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-verifiable Lloyd k-means: every sweep's assignment is decided
  * in EXACT integer arithmetic, so the trained clustering — not just a
  * downstream recall pin — replays bit-identically in any engine.
  *
  * The usual reason k-means can't be oracle-checked is fp: cell
  * assignment compares float distances whose partial-sum order differs
  * across engines, and centroid means divide floats, so one boundary
  * vector flips and the whole next sweep diverges. This operator
  * removes fp from the decision path entirely:
  *
  *  - vectors quantize ONCE to integer micro-units
  *    (`floor(x * 1e6)` of the exact float→double widening — a single
  *    IEEE multiply both engines perform identically);
  *  - a centroid is the exact RATIONAL (sum-vector s, count n) — never
  *    a divided mean;
  *  - "p is closer to centroid j than i" is the cross-multiplied
  *    integer comparison `D_j·n_i² ≤ D_i·n_j²` with
  *    `D_j = Σ_d (n_j·p_d − s_j_d)²` riding decimal(38,0) (Spark) /
  *    HUGEINT (DuckDB) — exact at these magnitudes, ties broken toward
  *    the lower cluster id by CASE order.
  *
  * Scale shape: the k·(dims+1) centroid integers live on the driver
  * (as in any k-means) and close over each sweep's assignment kernel,
  * so assignment is MAP-SIDE per-row arithmetic — zero corpus
  * shuffle — and each sweep's update is one groupBy(cluster)
  * partial-aggregated sum collect of k rows. Sweeps × one scan, like
  * [[Similarity.ivfCentroids]] (the fp production path this verifies
  * the algorithm of). Long-arithmetic safety is a JOINT envelope
  * enforced per row in the kernel: |q| ≤ 2^61 / maxClusterCount keeps
  * the inner term n·q within 2^61, and |q| ≤ 2^62 / corpusCount keeps
  * EVERY possible cluster sum Σq (hence every |s|, under any
  * assignment — even one that concentrates the whole corpus into one
  * cluster) within 2^62, so n·q − s stays within ±3·2^61 < Long range
  * and the groupBy sums can never wrap either; squares and
  * cross-multiplied comparisons ride BigInt. The check fails loudly on
  * the first violating vector instead of silently wrapping.
  *
  * Reference semantics: Lloyd (1957/1982); the seed is the k
  * lowest-id vectors (deterministic, like ivfCentroids' "first").
  * Empty clusters keep their previous centroid.
  */
object KmeansExact {

  /** (cluster, n_points, m0..m{dims-1}) — final-assignment cluster
    * sizes and floor'd micro-unit means after `sweeps` exact Lloyd
    * updates. `emb`'s `vecCol` is an array column (float or double).
    */
  def lloyd(emb: DataFrame, idCol: String, vecCol: String,
            k: Int, dims: Int, sweeps: Int): DataFrame = {
    require(k >= 2 && dims >= 1 && sweeps >= 1)
    val qCols = (0 until dims).map(i =>
      expr(quantExpr(s"element_at($vecCol, ${i + 1})")).as(s"q$i"))
    val q = graft.ops.Staging.stage(
      emb.select((col(idCol).cast("long").as("vid") +: qCols): _*))
    // corpus count, fetched once off the staged frame: the sum-side
    // half of the overflow envelope (|q| ≤ 2^62 / corpusN bounds every
    // possible cluster sum at 2^62 under ANY assignment — the r14
    // guard only bounded the inner term, so a sweep that concentrated
    // >4× the prior max cluster count into one cluster could wrap the
    // update/mean sums without any row violating that sweep's check)
    val corpusN = q.count()

    // seed: the k lowest-id vectors, each an exact rational (s, n=1)
    var cents: Seq[(Long, IndexedSeq[Long])] =
      q.orderBy("vid").limit(k).collect().toSeq
        .map(r => (1L, (0 until dims).map(i => r.getLong(i + 1))))
    require(cents.size == k, s"corpus has < $k vectors")

    // Assignment is a MAP-SIDE mapPartitions kernel over the k·(d+1)
    // closed-over centroid integers — the same exact arithmetic the
    // oracle's HUGEINT CTEs perform (n·q − s in long under the joint
    // envelope guarded below — inner term ≤ 2^61 AND every possible
    // sum ≤ 2^62 — squares/cross-multiplied comparisons in BigInt,
    // so no overflow is possible anywhere), chosen over the
    // equivalent decimal(38,0) column
    // formulation because THAT plan's size grows with k·dims (4×64
    // 28 KB expression trees re-analyzed and re-codegen'd per sweep —
    // measured as most of the query's wall time) while this kernel
    // is constant plan, zero shuffle, and exact by construction.
    def assigned(cs: Seq[(Long, IndexedSeq[Long])]): DataFrame = {
      val cn = cs.map(_._1).toArray
      val csv = cs.map(_._2.toArray).toArray
      val qBound = math.min(quantBound(cn.max), sumBound(corpusN))
      val outSchema = org.apache.spark.sql.types.StructType(
        q.schema.fields :+ org.apache.spark.sql.types.StructField(
          "cl", org.apache.spark.sql.types.LongType, nullable = false))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      val kk = k; val dd = dims
      q.mapPartitions { rows =>
        rows.map { r =>
          // enforce the joint overflow contract n·|q| <= 2^61 against
          // THIS sweep's actual max cluster count (|s| <= n·max|q|
          // <= 2^61 follows inductively — every prior member passed
          // the same check — so the long inner term n·q − s stays
          // within ±2^62). Checked per row in the kernel: zero extra
          // jobs, fails loudly on the first violating vector instead
          // of silently wrapping to a wrong (not failing) clustering.
          var v0 = 0
          while (v0 < dd) {
            val v = r.getLong(v0 + 1)
            if (v > qBound || v < -qBound)
              throw new IllegalArgumentException(
                s"quantized component $v violates the exact-arithmetic " +
                  s"envelope (this sweep allows |q| <= $qBound " +
                  "micro-units: min of 2^61/maxClusterCount for the " +
                  "inner term n·q − s and 2^62/corpusCount so no " +
                  "cluster sum can wrap under any assignment) — " +
                  "rescale the embedding or shrink the quantization step")
            v0 += 1
          }
          val d = new Array[BigInt](kk)
          var j = 0
          while (j < kk) {
            val n = cn(j); val s = csv(j)
            var acc = BigInt(0)
            var i = 0
            while (i < dd) {
              val diff = n * r.getLong(i + 1) - s(i)
              acc += BigInt(diff) * BigInt(diff)
              i += 1
            }
            d(j) = acc
            j += 1
          }
          val nn = cn.map(n => BigInt(n) * BigInt(n))
          var best = kk - 1
          var found = false
          j = 0
          while (j < kk && !found) {
            var ok = true
            var i = 0
            while (i < kk && ok) {
              if (i != j && d(j) * nn(i) > d(i) * nn(j)) ok = false
              i += 1
            }
            if (ok) { best = j; found = true }
            j += 1
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best.toLong)
        }
      }(enc)
    }

    for (_ <- 0 until sweeps) {
      val aggs = count(lit(1)).as("n") +:
        (0 until dims).map(i => sum(col(s"q$i")).as(s"t$i"))
      val g = assigned(cents).groupBy("cl").agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), (0 until dims).map(i => r.getLong(i + 2)))))
        .toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        g.getOrElse(j.toLong, old)
      }
    }

    val aggs = count(lit(1)).as("n_points") +:
      (0 until dims).map(i => sum(col(s"q$i")).as(s"t$i"))
    assigned(cents).groupBy("cl").agg(aggs.head, aggs.tail: _*)
      .select(col("cl").as("cluster") +: col("n_points") +:
        (0 until dims).map(i =>
          expr(s"CAST(floor(t$i * 1.0 / n_points) AS BIGINT)").as(s"m$i")): _*)
      .orderBy("cluster")
  }

  private def quantExpr(x: String): String =
    s"CAST(floor(CAST($x AS DOUBLE) * 1000000.0) AS BIGINT)"

  /** Largest |q| safe for the exact long inner term n·q − s when the
    * biggest cluster holds `maxN` points: n·|q| ≤ 2^61 keeps |n·q|
    * and (inductively) |s| within 2^61 each, so the difference stays
    * within ±2^62 < Long range. Package-visible so the spec can pin
    * the envelope arithmetic without synthesizing 2^40-point
    * clusters. */
  private[graft] def quantBound(maxN: Long): Long =
    (1L << 61) / math.max(maxN, 1L)

  /** Largest |q| that keeps EVERY possible cluster sum Σq within 2^62
    * when the whole corpus holds `corpusN` points — the sum-side half
    * of the envelope: with it, the per-sweep update and final-mean
    * groupBy sums cannot wrap in Long under ANY assignment, and the
    * inner term n·q − s stays within 2^61 + 2^62 = 3·2^61 < 2^63.
    * Package-visible for the spec, like [[quantBound]]. */
  private[graft] def sumBound(corpusN: Long): Long =
    (1L << 62) / math.max(corpusN, 1L)

  /** The self-contained DuckDB replay of [[lloyd]] over the
    * `embeddings` table: the same quantization, seed, exact-integer
    * assignment (HUGEINT standing in for decimal(38,0)) and
    * empty-cluster fallback, with each sweep's centroid state carried
    * through a pivoted one-row CTE instead of driver literals —
    * exact integers on both sides, so the values agree even though
    * one side holds them in columns and the other in literals.
    */
  def lloydOracleSql(k: Int, dims: Int, sweeps: Int): String = {
    val ds = 0 until dims
    val ks = 0 until k
    val qCols = ds.map(i =>
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1000000.0) AS BIGINT) AS q$i")
      .mkString(",\n    ")
    val seedPivot = ks.map { j =>
      s"CAST(1 AS HUGEINT) AS n$j,\n    " + ds.map(i =>
        s"CAST(max(CASE WHEN rn = ${j + 1} THEN q$i END) AS HUGEINT) AS s${j}_$i")
        .mkString(",\n    ")
    }.mkString(",\n    ")
    def dCols = ks.map { j =>
      val terms = ds.map { i =>
        val a = s"(n$j * q$i - s${j}_$i)"
        s"$a * $a"
      }.mkString(" + ")
      s"$terms AS d$j"
    }.mkString(",\n    ")
    def caseText = {
      val best = ks.map { j =>
        ks.filter(_ != j).map(i =>
          s"d$j * (n$i * n$i) <= d$i * (n$j * n$j)")
          .mkString("(", " AND ", ")")
      }
      best.init.zipWithIndex.map { case (b, j) => s"WHEN $b THEN $j" }
        .mkString("CAST(CASE ", " ", s" ELSE ${k - 1} END AS BIGINT)")
    }
    def gCols = ks.map { j =>
      s"sum(CASE WHEN cl = $j THEN 1 ELSE 0 END) AS g${j}n,\n    " +
        ds.map(i => s"sum(CASE WHEN cl = $j THEN q$i ELSE 0 END) AS g${j}_$i")
          .mkString(",\n    ")
    }.mkString(",\n    ")
    def cNext = ks.map { j =>
      s"CASE WHEN g.g${j}n > 0 THEN CAST(g.g${j}n AS HUGEINT) ELSE c.n$j END AS n$j,\n    " +
        ds.map(i =>
          s"CASE WHEN g.g${j}n > 0 THEN CAST(g.g${j}_$i AS HUGEINT) ELSE c.s${j}_$i END AS s${j}_$i")
          .mkString(",\n    ")
    }.mkString(",\n    ")

    val sb = new StringBuilder
    sb.append("WITH q AS (\n")
    sb.append(s"  SELECT CAST(vec_id AS BIGINT) AS vid,\n    $qCols\n  FROM embeddings),\n")
    sb.append("seed AS (\n  SELECT *, row_number() OVER (ORDER BY vid) AS rn\n")
    sb.append(s"  FROM q ORDER BY vid LIMIT $k),\n")
    sb.append(s"c0 AS (\n  SELECT\n    $seedPivot\n  FROM seed),\n")
    for (sw <- 0 until sweeps) {
      sb.append(s"dd$sw AS (\n  SELECT q.*, c.*,\n    $dCols\n  FROM q CROSS JOIN c$sw c),\n")
      sb.append(s"a$sw AS (\n  SELECT *, $caseText AS cl\n  FROM dd$sw),\n")
      sb.append(s"g$sw AS (\n  SELECT\n    $gCols\n  FROM a$sw),\n")
      sb.append(s"c${sw + 1} AS (\n  SELECT\n    $cNext\n  FROM g$sw g CROSS JOIN c$sw c),\n")
    }
    sb.append(s"ddF AS (\n  SELECT q.*, c.*,\n    $dCols\n  FROM q CROSS JOIN c$sweeps c),\n")
    sb.append(s"aF AS (\n  SELECT *, $caseText AS cl\n  FROM ddF)\n")
    val means = ds.map(i =>
      s"CAST(floor(sum(q$i) * 1.0 / count(*)) AS BIGINT) AS m$i")
      .mkString(",\n  ")
    sb.append("SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n_points,\n")
    sb.append(s"  $means\nFROM aF GROUP BY cl ORDER BY cluster")
    sb.toString
  }
}
