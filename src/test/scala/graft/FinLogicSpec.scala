package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.finlogic.{Company, FinData, Indicators}

/** Reference-parity tests on a hand-computed CVM-shaped fixture
  * (FIXTURES.md §A), replicating the correctness-trap list in
  * SURVEY.md §2.10: EPS unit exemption, LTM labeling, lag fallback
  * order, margin cutoffs, tax-rate constant, translation fallback,
  * zero-fill.
  */
class FinLogicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- fixture ---------------------------------------------------
  private val Codes = Seq("1", "1.01", "1.01.01", "1.01.02", "2.01", "2.01.04",
    "2.02.01", "2.03", "3.01", "3.03", "3.05", "3.07", "3.08", "3.11",
    "6.01", "6.01.01.04", "3.99.01.01")
  private val Names = Map(
    "1" -> "Ativo Total", "1.01" -> "Ativo Circulante",
    "3.01" -> "Receita de Venda").withDefault(c => s"Conta $c")

  // 2020 base values for company ALPHA (consolidated); later years and
  // quarters are scaled multiples so ratios are hand-checkable.
  private val Base: Map[String, Double] = Map(
    "1" -> 100e6, "1.01" -> 40e6, "1.01.01" -> 10e6, "1.01.02" -> 5e6,
    "2.01" -> 30e6, "2.01.04" -> 8e6, "2.02.01" -> 12e6, "2.03" -> 50e6,
    "3.01" -> 80e6, "3.03" -> 32e6, "3.05" -> 20e6, "3.07" -> 18e6,
    "3.08" -> -6e6, "3.11" -> 12e6, "6.01" -> 15e6, "6.01.01.04" -> 5e6,
    "3.99.01.01" -> 1.5)

  private def rows(cvm: Long, name: String, tax: String, cons: Boolean,
                   annual: Boolean, period: String, factor: Double) =
    Codes.map(c => (cvm, name, tax, c, Names(c), Base(c) * factor,
      annual, cons, period, period))

  private lazy val financialsRaw: DataFrame = {
    val alphaAnnual = Seq("2020-12-31" -> 1.0, "2021-12-31" -> 1.1, "2022-12-31" -> 1.2)
      .flatMap { case (p, f) => rows(1L, "ALPHA", "11.111", true, true, p, f) }
    val alphaQuarterly = Seq("2022-03-31" -> 0.25, "2022-06-30" -> 0.26,
        "2022-09-30" -> 0.27, "2023-03-31" -> 0.30)
      .flatMap { case (p, f) => rows(1L, "ALPHA", "11.111", true, false, p, f) }
    // BETA: tiny company below the 1M cutoff, both accounting methods.
    val beta = Seq(true, false).flatMap(cons =>
      Seq("2021-12-31" -> 0.005, "2022-12-31" -> 0.006)
        .flatMap { case (p, f) => rows(2L, "BETA", "22.222", cons, true, p, f) })
    // GAMMA: untraded company (excluded when isTraded = true).
    val gamma = rows(3L, "GAMMA", "33.333", true, true, "2022-12-31", 1.0)
    // Duplicate filing for ALPHA (cvm,cons,"1",2020): lower value,
    // quarterly -> dedup keeps the annual/higher row.
    val dup = Seq((1L, "ALPHA", "11.111", "1", Names("1"), 99e6, false, true,
      "2020-12-31", "2020-12-31"))
    (alphaAnnual ++ alphaQuarterly ++ beta ++ gamma ++ dup)
      .toDF("cvm_id", "name_id", "tax_id", "acc_code", "acc_name", "acc_value",
            "is_annual", "is_consolidated", "period_begin", "period_end")
      .withColumn("period_begin", to_date($"period_begin"))
      .withColumn("period_end", to_date($"period_end"))
  }

  private lazy val tradesRaw: DataFrame = Seq(
    (1L, "2023-01-01", 500000.0, "oil and gas", false, "ALPH3"),
    (1L, "2023-06-01", 900000.0, "oil and gas", false, "ALPH4"), // latest wins
    (2L, "2023-06-01", 200000.0, "banking", true, "BETA3"),
    (4L, "2023-06-01", 50000.0, "mining", false, "DELT3"), // below min volume
  ).toDF("cvm_id", "trade_date", "volume", "segment", "is_restructuring",
         "most_traded_stock")
    .withColumn("trade_date", to_date($"trade_date"))

  private lazy val languageRaw: DataFrame = Seq(
    ("Ativo Total", "Total Assets"),
    ("Ativo Circulante", "Current Assets"),
    ("Receita de Venda", "Sales Revenue"),
  ).toDF("pt", "en")

  private lazy val data: FinData = FinData.build(financialsRaw, tradesRaw, languageRaw)

  private def ind(cvm: Long, annual: Boolean, period: String): Map[String, Double] = {
    val r = data.indicators.filter($"cvm_id" === cvm && $"is_annual" === annual &&
      $"is_consolidated" === true &&
      date_format($"period_end", "yyyy-MM-dd") === period).head()
    r.schema.fieldNames.zipWithIndex.collect {
      case (n, i) if r.schema(i).dataType.typeName == "double" => n -> r.getDouble(i)
    }.toMap
  }

  // ---- load ------------------------------------------------------
  test("load: latest trade per company, min-volume filter, semi-join") {
    assert(data.trades.count() == 2) // cvm 4 below volume, cvm 1 deduped
    assert(data.trades.filter($"cvm_id" === 1).head().getAs[String]("most_traded_stock") == "ALPH4")
    // GAMMA (cvm 3) not traded -> excluded from financials
    assert(data.financials.filter($"cvm_id" === 3).count() == 0)
    assert(data.financials.select("cvm_id").distinct().count() == 2)
  }

  test("load with isTraded=false keeps all companies") {
    val all = FinData.build(financialsRaw, tradesRaw, languageRaw, isTraded = false)
    assert(all.financials.select("cvm_id").distinct().count() == 3)
  }

  // ---- indicators ------------------------------------------------
  test("indicators: dedup keeps the annual filing on duplicate keys") {
    val m = ind(1L, annual = true, "2020-12-31")
    assert(m("total_assets") == 100e6) // not the 99e6 duplicate
  }

  test("indicators: derived columns and 2021 golden ratios") {
    val m = ind(1L, annual = true, "2021-12-31")
    assert(math.abs(m("total_cash") - 16.5e6) < 1)
    assert(math.abs(m("total_debt") - 22e6) < 1)
    assert(math.abs(m("working_capital") - 11e6) < 1)
    assert(math.abs(m("ebitda") - 27.5e6) < 1)
    assert(math.abs(m("invested_capital") - 60.5e6) < 1)
    assert(math.abs(m("net_debt") - 5.5e6) < 1)
    assert(math.abs(m("effective_tax_rate") - 1.0 / 3.0) < 1e-9)
    assert(math.abs(m("gross_margin") - 0.4) < 1e-9)
    assert(math.abs(m("operating_margin") - 0.25) < 1e-9)
    assert(math.abs(m("net_margin") - 0.15) < 1e-9)
    assert(math.abs(m("ebitda_margin") - 0.3125) < 1e-9)
    // ROA/ROE/ROIC use ebit*(1-0.34) over trailing averages (trap 6)
    assert(math.abs(m("return_on_assets") - 22e6 * 0.66 / 105e6) < 1e-9)
    assert(math.abs(m("return_on_equity") - 22e6 * 0.66 / 52.5e6) < 1e-9)
    assert(math.abs(m("roic") - 22e6 * 0.66 / 57.75e6) < 1e-9)
  }

  test("indicators: first year trailing average falls back to self") {
    val m = ind(1L, annual = true, "2020-12-31")
    assert(math.abs(m("return_on_assets") - 20e6 * 0.66 / 100e6) < 1e-9)
  }

  test("indicators: quarterly keeps only the LTM row with lag-1 fallback") {
    val q = data.indicators.filter($"cvm_id" === 1 && !$"is_annual")
    assert(q.count() == 1) // only the 2023-03-31 LTM snapshot
    val m = ind(1L, annual = false, "2023-03-31")
    // avg_total_assets = (0.30 + 0.27)/2 * 100e6 = 28.5e6 (lag-4 null -> lag-1)
    assert(math.abs(m("return_on_assets") - (0.30 * 20e6) * 0.66 / 28.5e6) < 1e-9)
    assert(math.abs(m("operating_margin") - 0.25) < 1e-9) // ratios scale-invariant
  }

  test("indicators: zero-filled missing accounts give IEEE NaN/Inf tax rate, not an ANSI error") {
    // A company reporting only total assets: ebt pivots to 0 ->
    // effective_tax_rate = -0/0 = NaN (reference Polars semantics).
    val sparse = Seq((7L, "SPARSE", "77", "1", "Ativo", 5e6, true, true,
        "2022-12-31", "2022-12-31"))
      .toDF("cvm_id", "name_id", "tax_id", "acc_code", "acc_name", "acc_value",
            "is_annual", "is_consolidated", "period_begin", "period_end")
      .withColumn("period_begin", to_date($"period_begin"))
      .withColumn("period_end", to_date($"period_end"))
    val out = Indicators.build(sparse).head()
    assert(out.getAs[Double]("effective_tax_rate").isNaN)
  }

  test("indicators: margins zeroed below the 1M revenue cutoff (trap 4)") {
    val m = ind(2L, annual = true, "2022-12-31")
    assert(m("revenues") == 0.006 * 80e6) // 480k < 1M
    assert(m("gross_margin") == 0.0)
    assert(m("operating_margin") == 0.0)
    assert(m("return_on_assets") == 0.0) // avg assets 590k < 1M
  }

  // ---- search / rank / info --------------------------------------
  test("searchCompany by name is case-insensitive on the search term") {
    val out = data.searchCompany("alpha").collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L)
    assert(out(0).getAs[String]("most_traded_stock") == "ALPH4")
  }

  test("searchCompany by cvm_id and segment") {
    assert(data.searchCompany("2", "cvm_id").count() == 1)
    assert(data.searchCompany("oil", "segment").count() == 1)
  }

  test("searchSegment") {
    val segs = data.searchSegment("bank").collect().map(_.getString(0))
    assert(segs.toSeq == Seq("banking"))
    // regex-contains semantics: "an" matches both segments
    assert(data.searchSegment("an").count() == 2)
  }

  test("rank by operating_margin at latest filing") {
    val out = data.rank(rankBy = "operating_margin").collect()
    assert(out.map(_.getAs[String]("name_id")).toSeq == Seq("ALPHA", "BETA"))
    assert(math.abs(out(0).getAs[Double]("operating_margin") - 0.25) < 1e-9)
    assert(out(1).getAs[Double]("operating_margin") == 0.0)
    // ALPHA's latest filing is the quarterly LTM period
    assert(out(0).getAs[Any]("period_end").toString == "2023-03-31")
  }

  test("info counts") {
    val kv = data.info("path").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("number_of_companies") == "2")
    assert(kv("first_report") == "2020-12-31")
    assert(kv("last_report") == "2023-03-31")
    // the reference reports resident MB (data.py:81,86); the Spark
    // analog is persisted storage, materialized by the time the row
    // is built — must exist and be positive
    assert(kv.contains("memory_usage_mb"))
    assert(kv("memory_usage_mb").toDouble > 0.0,
      s"cached frames must report positive storage, got ${kv("memory_usage_mb")}")
  }

  // ---- Company ---------------------------------------------------
  lazy val alpha = new Company(data, 1, accUnitSpec = "m")

  test("Company resolves identifier by cvm id and tax id; unknown raises") {
    assert(alpha.nameId == "ALPHA" && alpha.taxId == "11.111")
    val byTax = new Company(data, "22.222")
    assert(byTax.cvmId == 2L)
    intercept[NoSuchElementException] { new Company(data, 999) }
  }

  test("Company period attributes and LTM detection") {
    assert(alpha.firstPeriod.contains("2020-12-31"))
    assert(alpha.lastPeriod.contains("2023-03-31"))
    assert(alpha.lastAnnual.contains("2022-12-31"))
    assert(alpha.lastPeriodType == "quarterly")
    assert(alpha.lastQuarterly.contains("2023-03-31"))
  }

  test("report: unit scaling, EPS exemption, LTM label, zero-fill") {
    val rep = alpha.report("assets")
    val cols = rep.columns.toSeq
    assert(cols.contains("2023-03-31 ltm")) // trap 2
    val total = rep.filter($"acc_code" === "1").head()
    assert(total.getAs[Double]("2020-12-31") == 100.0) // scaled by 1e6
    assert(total.getAs[Double]("2023-03-31 ltm") == 30.0)
    // stale quarters dropped: 2022-03-31 (not last) must be absent
    assert(!cols.contains("2022-03-31"))
    // EPS exempt from unit scaling (trap 1)
    val eps = alpha.report("earnings_per_share").filter($"acc_code" === "3.99.01.01").head()
    assert(eps.getAs[Double]("2021-12-31") == 1.5 * 1.1)
  }

  test("report: English translation with (pt) fallback (trap 8)") {
    val rep = alpha.report("assets")
    val names = rep.select("acc_code", "acc_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("1") == "Total Assets")
    assert(names("1.01") == "Current Assets")
    assert(names("1.01.01") == "(pt) Conta 1.01.01")
    val pt = new Company(data, 1, languageSpec = "portuguese").report("assets")
    assert(pt.filter($"acc_code" === "1").head().getAs[String]("acc_name") == "Ativo Total")
  }

  test("report: acc_level depth filter (P9) and num_years slice") {
    val lvl2 = alpha.report("balance_sheet", accLevel = 2)
    val codes = lvl2.select("acc_code").collect().map(_.getString(0))
    assert(codes.forall(_.count(_ == '.') <= 1))
    val sliced = alpha.report("assets", numYears = 2)
    val periodCols = sliced.columns.filterNot(Seq("acc_code", "acc_name").contains)
    assert(periodCols.toSeq == Seq("2022-12-31", "2023-03-31 ltm"))
  }

  test("custom_report unions statements and filters codes") {
    val rep = alpha.customReport(Seq("1", "3.01", "6.01"))
    assert(rep.count() == 3)
  }

  test("Company.indicators: wide format in display order, unit-scaled") {
    val df = alpha.indicators()
    val inds = df.select("indicator").collect().map(_.getString(0)).toSeq
    assert(inds == Indicators.IndicatorOrder)
    val rev = df.filter($"indicator" === "revenues").head()
    assert(math.abs(rev.getAs[Double]("2021-12-31") - 88.0) < 1e-9) // scaled by 1e6
    val eps = df.filter($"indicator" === "eps").head()
    assert(math.abs(eps.getAs[Double]("2021-12-31") - 1.65) < 1e-9) // not scaled
    val roic = df.filter($"indicator" === "roic").head()
    assert(math.abs(roic.getAs[Double]("2021-12-31") - 22e6 * 0.66 / 57.75e6) < 1e-9)
  }

  test("Company.info") {
    val kv = alpha.info().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("Name") == "ALPHA")
    assert(kv("Selected Accounting Unit") == "1000000.0")
    assert(kv("Last Report") == "2023-03-31")
  }

  test("Company with an empty accounting slice degrades gracefully") {
    // GAMMA exists only consolidated; the separate slice is empty
    // (reference prints a message and returns None from info()).
    val all = FinData.build(financialsRaw, tradesRaw, languageRaw, isTraded = false)
    val co = new Company(all, 3, isConsolidated = false)
    assert(co.accountingRows == 0L)
    assert(co.firstPeriod.isEmpty && co.lastPeriod.isEmpty)
    assert(co.report("assets").count() == 0)
    assert(co.indicators().count() == 0)
    assert(co.info().count() == 9) // info still renders attributes
  }

  test("invalid arguments raise") {
    intercept[IllegalArgumentException] { new Company(data, 1, accUnitSpec = "x") }
    intercept[IllegalArgumentException] { new Company(data, 1, languageSpec = "latin") }
    intercept[IllegalArgumentException] { new Company(data, 1, taxRate = 1.5) }
    intercept[IllegalArgumentException] { alpha.report("nope") }
  }

  // ---- reconfiguration surface (reference company.py:94-246) ------

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.columns.toSeq == b.columns.toSeq &&
      a.collect().map(_.toString).sorted.toSeq ==
        b.collect().map(_.toString).sorted.toSeq

  test("withUnit re-derives state identical to a fresh Company") {
    val re = alpha.withUnit("t")
    val fresh = new Company(data, 1, accUnitSpec = "t")
    assert(re.accUnit == 1000.0)
    assert(same(re.report("assets"), fresh.report("assets")))
    assert(same(re.indicators(), fresh.indicators()))
    // and the original is untouched (immutability)
    assert(alpha.accUnit == 1e6)
  }

  test("withConsolidated re-derives the slice like a fresh Company") {
    val all = FinData.build(financialsRaw, tradesRaw, languageRaw, isTraded = false)
    val cons = new Company(all, 2)
    val re = cons.withConsolidated(false)
    val fresh = new Company(all, 2, isConsolidated = false)
    assert(re.accountingRows == fresh.accountingRows)
    assert(same(re.report("assets"), fresh.report("assets")))
  }

  test("withIdentifier re-resolves; unknown still raises") {
    val re = alpha.withIdentifier("22.222")
    assert(re.cvmId == 2L && re.nameId == "BETA")
    // settings carry over across the re-resolution (reference keeps them)
    assert(re.accUnit == 1e6)
    intercept[NoSuchElementException] { alpha.withIdentifier(999) }
  }

  test("FinLogic module facade mirrors the reference's public surface 1:1") {
    import graft.finlogic.FinLogic
    intercept[IllegalStateException] { FinLogic.info() } // unloaded state
    val dir = java.nio.file.Files.createTempDirectory("finlogic").toString
    financialsRaw.write.mode("overwrite").parquet(s"$dir/fin")
    tradesRaw.write.mode("overwrite").parquet(s"$dir/trades")
    languageRaw.write.mode("overwrite").parquet(s"$dir/lang")
    FinLogic.load(spark, s"$dir/fin", s"$dir/trades", s"$dir/lang")
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    assert(rows(FinLogic.searchCompany("ALPHA")) == rows(data.searchCompany("ALPHA")))
    assert(rows(FinLogic.searchSegment("oil")) == rows(data.searchSegment("oil")))
    assert(rows(FinLogic.rank()) == rows(data.rank()))
    assert(FinLogic.info().count() == 7)
    val viaFacade = FinLogic.company(1, accUnit = "m").report("assets")
    assert(rows(viaFacade.orderBy("acc_code")) ==
      rows(alpha.report("assets").orderBy("acc_code")))
    FinLogic.unload()
    intercept[IllegalStateException] { FinLogic.searchSegment("x") }
  }

  test("withLanguage and withTaxRate validate like the reference setters") {
    val pt = alpha.withLanguage("PORTUGUESE")
    assert(pt.language == "Portuguese")
    assert(same(pt.report("assets"),
      new Company(data, 1, accUnitSpec = "m", languageSpec = "portuguese").report("assets")))
    assert(alpha.withTaxRate(0.21).taxRate == 0.21)
    intercept[IllegalArgumentException] { alpha.withLanguage("latin") }
    intercept[IllegalArgumentException] { alpha.withTaxRate(1.5) }
    intercept[IllegalArgumentException] { alpha.withUnit("x") }
  }
}
