package graft.finlogic

import org.apache.spark.sql.types._

/** Explicit schemas for the CVM-shaped tables (reconstructed from
  * every column reference in the reference library — see SURVEY.md
  * §1.2; reference `src/finlogic/data.py:44-58`).
  *
  * Supplying schemas at read time skips Parquet footer inference on
  * cold scans and pins the types the engine assumes (Double money,
  * Date periods).
  */
object Schemas {

  val financials: StructType = StructType(Seq(
    StructField("cvm_id", LongType, nullable = false),
    StructField("name_id", StringType),
    StructField("tax_id", StringType),
    StructField("acc_code", StringType),
    StructField("acc_name", StringType),
    StructField("acc_value", DoubleType),
    StructField("is_annual", BooleanType, nullable = false),
    StructField("is_consolidated", BooleanType, nullable = false),
    StructField("period_begin", DateType),
    StructField("period_end", DateType, nullable = false),
  ))

  val trades: StructType = StructType(Seq(
    StructField("cvm_id", LongType, nullable = false),
    StructField("trade_date", DateType),
    StructField("volume", DoubleType),
    StructField("segment", StringType),
    StructField("is_restructuring", BooleanType),
    StructField("most_traded_stock", StringType),
  ))

  val language: StructType = StructType(Seq(
    StructField("pt", StringType, nullable = false),
    StructField("en", StringType),
  ))
}
