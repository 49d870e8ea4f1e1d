package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed access to the driver-generated testdata star schema
  * (TPC-H-ish + events/documents/embeddings). One parquet per table;
  * column pruning and filter pushdown reach the scan because reads
  * stay fully declarative.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts normalized to a session-timezone TimestampType whatever
    * the parquet encoding of the driver's generator happens to be — see
    * [[Tables.normalizeTs]]. Downstream code may assume `ts` is a
    * TimestampType instant in 2024 range.
    */
  def events: DataFrame = Tables.normalizeTs(t("events"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

  /** Normalize one ts column read from parquet to TimestampType,
    * regardless of which physical encoding the writer chose. The
    * testdata generator has shipped events.ts as INT64 TIMESTAMP(NANOS)
    * (arrives as LongType under spark.sql.legacy.parquet.nanosAsLong)
    * and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as
    * TIMESTAMP_NTZ); both must decode to the same instants. The
    * sessions run in UTC (GraftSession), so casting the naive NTZ local
    * datetime to TimestampType re-labels, never shifts, the value —
    * identical to how DuckDB reads the same file naively.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      // integer `div` — nanos exceed double's exact range, so no `/`
      case LongType         => df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType => df.withColumn(colName, df(colName).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"unsupported ts encoding: $other (expected long nanos, timestamp_ntz, or timestamp)")
    }
}
