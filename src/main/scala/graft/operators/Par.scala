package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for per-row-HEAVY operators (tokenize + hash
  * chains), per optimization-guide §2.5: "input skew: one huge
  * unsplittable file … repartition immediately after the read."
  *
  * The driver's testdata ships each table as a single-row-group
  * parquet file, so a scan executes as ONE task and everything fused
  * into the scan stage (per-window md5, shingling, tokenization)
  * serializes on one core of local[32]. `spread` hash-repartitions by
  * a stable key ONLY when the input cannot already feed the session's
  * default parallelism — at production scale a corpus spans thousands
  * of row-group splits, the condition is false, and no exchange (and
  * no text shuffle) is added. Hash-by-key placement is content-derived
  * and deterministic under task retry (no round-robin, no
  * sort-before-repartition pass).
  *
  * Deliberately NOT applied at the shared source layer: measured as a
  * blanket `Tables` rewrite it regressed the suite (every cheap scan
  * paid an AQE stage + broke build-side size estimates); only
  * operators whose scan-stage CPU dominates their runtime opt in.
  */
object Par {
  def spread(df: DataFrame, key: String): DataFrame = {
    if (sys.env.contains("SPARK_GRAFT_NO_SPREAD")) return df
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism, df(key))
    else df
  }
}
