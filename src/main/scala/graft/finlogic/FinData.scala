package graft.finlogic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernels

/** Immutable holder of the loaded tables — replaces the reference's
  * five mutable module globals (`src/finlogic/data.py:21-25`) with a
  * value. All four frames are cached: the reference's whole design
  * assumes RAM-resident tables, and Company/search/rank re-read them
  * repeatedly.
  */
final case class FinData(
    financials: DataFrame,
    trades: DataFrame,
    language: DataFrame,
    indicators: DataFrame) {

  /** Reference `data.py:70-95` info(): summary key/value frame built
    * from tiny collected aggregates. data_url is a runtime-environment
    * fact, reported as the source path here; memory_usage_mb is the
    * Spark analog of the reference's resident-DataFrame MB
    * (`data.py:81,86`): the summed cached size of THE FOUR FinData
    * frames — each frame is materialized (count on a cached frame),
    * after which its InMemoryRelation's plan stats report the actual
    * cached bytes. Scoped per-frame deliberately: a session-wide
    * storage readout would silently include unrelated persists (ext
    * operators' staged frames, user caches) in a number presented as
    * FinData's footprint.
    */
  def info(dataPath: String = ""): DataFrame = {
    val spark = financials.sparkSession
    import spark.implicits._
    val a = financials.agg(
      count(lit(1)).as("entries"),
      date_format(min("period_end"), "yyyy-MM-dd").as("first"),
      date_format(max("period_end"), "yyyy-MM-dd").as("last"),
      countDistinct("cvm_id").as("companies")).head()
    val nReports = financials.select("cvm_id", "is_annual", "period_end").distinct().count()
    val frames = Seq(financials, trades, language, indicators)
    frames.foreach(_.count()) // resident by contract; materialize caches
    val cachedMb = frames
      .map(_.queryExecution.optimizedPlan.stats.sizeInBytes.toLong)
      .sum / 1048576.0
    Seq(
      ("data_url", dataPath),
      // Locale.ROOT: f"" uses the JVM default locale, which renders a
      // comma decimal point under e.g. de_DE and breaks .toDouble parsers.
      ("memory_usage_mb", String.format(java.util.Locale.ROOT, "%.3f", Double.box(cachedMb))),
      ("accounting_entries", a.getLong(0).toString),
      ("number_of_reports", nReports.toString),
      ("first_report", a.getString(1)),
      ("last_report", a.getString(2)),
      ("number_of_companies", a.getLong(3).toString),
    ).toDF("key", "FinLogic Info")
  }

  /** Reference `data.py:98-100` search_segment. */
  def searchSegment(searchValue: String): DataFrame =
    trades.select("segment").distinct()
      .filter(col("segment").rlike(searchValue))
      .orderBy("segment")

  /** Reference `data.py:103-149` search_company: one row per company
    * matching the search, joined with latest-trade info.
    */
  def searchCompany(searchValue: String, searchBy: String = "name_id"): DataFrame = {
    // Total-ordered dedup (trap 7): name/tax are functionally
    // dependent on cvm_id in practice, but keep-last under a total
    // ordering keeps the result partition-independent by construction.
    val universe = Kernels.dedupKeepLast(
        financials.select("name_id", "cvm_id", "tax_id"),
        keys = Seq("cvm_id"),
        order = Seq(col("name_id"), col("tax_id")))
      .join(broadcast(trades), Seq("cvm_id"))
    val filtered = searchBy match {
      case "name_id" => universe.filter(col("name_id").rlike(searchValue.toUpperCase))
      case "cvm_id"  => universe.filter(col("cvm_id") === searchValue.trim.toLong)
      case "tax_id"  => universe.filter(col("tax_id") === searchValue)
      case "segment" => universe.filter(col("segment").rlike(searchValue))
      case other => throw new IllegalArgumentException(
        s"Invalid value for 'searchBy' argument: $other")
    }
    filtered.select("name_id", "cvm_id", "tax_id", "segment",
                    "is_restructuring", "most_traded_stock")
  }

  /** Reference `data.py:152-201` rank(): top-n companies by an
    * indicator at each company's latest filing. Executes as
    * scan -> one window (latest filing keys) -> two broadcast joins ->
    * TakeOrderedAndProject; the fact table is never shuffled twice.
    * Note the reference filters is_consolidated AFTER the joins
    * (trap 9) — preserved.
    */
  def rank(segment: Option[String] = None, n: Int = 10,
           rankBy: String = "operating_margin",
           isConsolidated: Boolean = true): DataFrame = {
    val latestFiling = Kernels.dedupKeepLast(
      financials.select("cvm_id", "name_id", "period_end", "is_consolidated"),
      keys = Seq("cvm_id"),
      order = Seq(col("period_end"), col("is_consolidated")))
    val segFilter = segment.map(sv => col("segment").rlike(sv)).getOrElse(lit(true))
    latestFiling
      .join(broadcast(trades), Seq("cvm_id"))
      .join(indicators.select("cvm_id", rankBy, "is_consolidated", "period_end"),
            Seq("cvm_id", "period_end", "is_consolidated"))
      .filter(segFilter && col("is_consolidated") === isConsolidated)
      .orderBy(col(rankBy).desc, col("cvm_id"))
      .limit(n)
      .select("name_id", "most_traded_stock", "cvm_id", "is_restructuring",
              "is_consolidated", "segment", "period_end", rankBy)
  }

  def company(identifier: Any,
              isConsolidated: Boolean = true,
              accUnit: Any = 1.0,
              taxRate: Double = 0.34,
              language: String = "english"): Company =
    new Company(this, identifier, isConsolidated, accUnit, taxRate, language)
}

object FinData {

  /** Reference `data.py:28-67` load(): read the three tables, keep
    * the latest trade per company above min_volume, optionally
    * restrict financials to traded companies (left-semi join — the
    * distributed form of the reference's collected-id is_in), and
    * build indicators. Caching materializes each once.
    */
  def load(spark: SparkSession,
           financialsPath: String, tradesPath: String, languagePath: String,
           isTraded: Boolean = true, minVolume: Double = 100000): FinData =
    build(
      spark.read.schema(Schemas.financials).parquet(financialsPath),
      spark.read.schema(Schemas.trades).parquet(tradesPath),
      spark.read.schema(Schemas.language).parquet(languagePath),
      isTraded, minVolume)

  /** Same pipeline over already-loaded frames (used by tests). */
  def build(financialsRaw: DataFrame, tradesRaw: DataFrame, languageRaw: DataFrame,
            isTraded: Boolean = true, minVolume: Double = 100000): FinData = {
    // Latest trade per company (reference data.py:48-53); ordering
    // made total with volume/stock tie-breaks.
    val trades = Kernels.dedupKeepLast(
      tradesRaw.filter(col("volume") >= minVolume),
      keys = Seq("cvm_id"),
      order = Seq(col("trade_date"), col("volume"), col("most_traded_stock"))).cache()
    val financials = (
      if (isTraded)
        financialsRaw.join(trades.select("cvm_id"), Seq("cvm_id"), "left_semi")
      else financialsRaw).cache()
    val indicators = Indicators.build(financials).cache()
    FinData(financials, trades, languageRaw.cache(), indicators)
  }
}
