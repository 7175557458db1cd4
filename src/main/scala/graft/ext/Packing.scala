package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic token-budget shard packing — the layout step between
  * curation and tokenization: documents are concatenated in a fixed
  * order and cut into shards of ~`tokenBudget` tokens, so every
  * training shard costs the same to load and the assignment is
  * reproducible (a document's (bucket, shard) never depends on
  * partitioning or cluster size).
  *
  * Packing is inherently SEQUENTIAL — a document's shard depends on
  * the cumulative token count before it — so the parallel unit is the
  * `bucket`: an independent packing stream (running cumsum via a
  * window partitioned by bucket; each bucket is one task's sort).
  * Scale rule: choose enough buckets that one bucket's rows fit a
  * task comfortably — corpus_tokens / buckets ~ 10-100 shard budgets.
  * The caller supplies the bucket expression (e.g. `pmod(id, B)` or a
  * [[Sampling.sampleHash]]-derived lane for id-decorrelated streams);
  * `orderCol` must totally order rows WITHIN a bucket or the cumsum —
  * and therefore the shard cut points — would be nondeterministic.
  *
  * A document STARTS in shard floor((cum_before_it) / budget);
  * documents are never split (the budget is a soft target — a shard
  * overflows by at most one document's tokens, the standard
  * concat-and-cut semantics).
  */
object Packing {

  def packShards(df: DataFrame, orderCol: Column, tokensCol: Column,
                 tokenBudget: Long, bucket: Column): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val reserved = Seq("pack_bucket", "pack_shard", "__cum")
    val clash = df.columns.filter(c => reserved.contains(c))
    require(clash.isEmpty,
      s"packShards writes reserved columns ${reserved.mkString(", ")}; " +
        s"input already has: ${clash.mkString(", ")} — rename or drop them first")
    val w = Window.partitionBy("pack_bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("pack_bucket", bucket)
      .withColumn("__cum", sum(tokensCol).over(w))
      .withColumn("pack_shard",
        floor((col("__cum") - tokensCol) / lit(tokenBudget.toDouble)).cast("long"))
      .drop("__cum")
  }
}
