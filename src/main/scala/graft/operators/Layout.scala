package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout clustering for scan pruning at rest.
  *
  * Sorting 100 TB by one key gives perfect pruning on that key and
  * none on any other; interleaving the bits of two keys (a Z-order /
  * Morton curve) gives *both* dimensions locality, so parquet
  * row-group min/max stats prune selective filters on either column.
  * The z-value is pure column math (portable to the oracle, codegen'd
  * in Spark); the layout step is `repartitionByRange(zval)` +
  * `sortWithinPartitions`, i.e. exactly what a writer does before
  * `partitioned_write`.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative ints:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. Expressed as
    * floor-div/mod arithmetic (not shifts) because both engines then
    * evaluate the identical formula; powers of two are exact doubles
    * so the long casts are exact.
    */
  def zvalue(x: Column, y: Column, bits: Int = 10): Column =
    // statically unrolled (bits is a plan-time constant): a flat sum of
    // codegen'd arithmetic, where a higher-order fold would run
    // interpreted per row
    (0 until bits).map { i =>
      pmod(floor(x / lit(math.pow(2.0, i))).cast("long"), lit(2L)) * lit(1L << (2 * i)) +
        pmod(floor(y / lit(math.pow(2.0, i))).cast("long"), lit(2L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Cluster rows along the z-curve of the two columns: range-
    * partition on the z-value (balanced output files), sort within
    * partitions (row-group locality inside each file).
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String, bits: Int = 10,
      partitions: Int = 32): DataFrame = {
    val z = df.withColumn("_z", zvalue(col(xCol), col(yCol), bits))
    z.repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Gated z-value computation over events (dims: user bucket × value
    * bucket). The layout operator itself is spec-gated on pruning
    * effectiveness — per-partition bounding boxes, LayoutSpec.
    */
  def qZorder(t: Tables, bits: Int = 10): DataFrame =
    t.events
      .select(col("event_id"),
        pmod(col("user_id"), lit(1024L)).as("ux"),
        pmod(floor(col("value")).cast("long"), lit(1024L)).as("vy"))
      .select(col("event_id"), zvalue(col("ux"), col("vy"), bits).as("zval"))
      .orderBy("event_id")

  def qZorderSql(bits: Int = 10): String =
    s"""WITH d AS (
       |  SELECT event_id,
       |    user_id % 1024 AS ux,
       |    CAST(floor(value) AS BIGINT) % 1024 AS vy
       |  FROM events
       |), b AS (
       |  SELECT event_id, i,
       |    (CAST(floor(ux / pow(2.0, i)) AS BIGINT) % 2) * CAST(pow(2.0, i * 2) AS BIGINT)
       |    + (CAST(floor(vy / pow(2.0, i)) AS BIGINT) % 2) * CAST(pow(2.0, i * 2 + 1) AS BIGINT) AS part
       |  FROM d, unnest(range(0, $bits)) r(i)
       |)
       |SELECT event_id, CAST(sum(part) AS BIGINT) AS zval
       |FROM b GROUP BY event_id
       |ORDER BY event_id""".stripMargin
}
