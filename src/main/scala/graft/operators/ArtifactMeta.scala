package graft.operators

import org.apache.spark.sql.SparkSession

/** Parameter metadata stamped into every persisted artifact
  * (`_meta`, one `key=value` per line) and VALIDATED on read.
  *
  * The failure class this kills is silent, not loud: probing an LSH
  * index with a different `rowsPerBand` than it was built with makes
  * every band key miss — zero candidates, which reads as "no
  * near-dups found"; re-curating from an annotate artifact with a
  * different `spanK` computes span ends against the wrong window
  * width — plausible-looking wrong survivors. A schema mismatch (a
  * different `k`) at least throws on the missing column; the
  * same-schema parameter mismatches never would. All IO goes through
  * the Hadoop FileSystem API — these artifacts live on HDFS/S3 in
  * the deployment they exist for, not a local disk.
  */
object ArtifactMeta {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def write(spark: SparkSession, dir: String, params: Map[String, Int]): Unit = {
    val (f, p) = fs(spark, dir)
    val out = f.create(new org.apache.hadoop.fs.Path(p, "_meta"), true)
    try out.write(params.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): Map[String, Int] = {
    val (f, p) = fs(spark, dir)
    val meta = new org.apache.hadoop.fs.Path(p, "_meta")
    if (!f.exists(meta)) Map.empty
    else {
      val in = f.open(meta)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v.trim.toInt
        }.toMap
      finally in.close()
    }
  }

  /** Require every caller parameter to match the artifact's stamp.
    * A pre-stamp artifact (no `_meta`) passes — the validation can't
    * retroactively protect what carries no provenance — but anything
    * built by current code fails LOUDLY on mismatch, naming both
    * values. `what` names the artifact kind in the error.
    */
  def validate(spark: SparkSession, dir: String, what: String,
      params: Map[String, Int]): Unit = {
    val stamped = read(spark, dir)
    params.foreach { case (k, v) =>
      stamped.get(k).foreach { s =>
        require(s == v,
          s"$what at $dir was built with $k=$s but is being read with $k=$v — " +
            "same-schema parameter mismatches corrupt results SILENTLY (wrong band " +
            "keys / span windows), so this is an error, not a warning")
      }
    }
  }
}
