package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-driven pipeline assembly — the reference's settings-file
  * surface (py-beam/main.py assembles its DAG from CLI/settings.json
  * input/ext/output; v2/main.py:93-204 switches loaders and transform
  * chains by editing a declarative block) re-expressed as a JSON
  * document compiled into ONE Catalyst plan.
  *
  * Design: the config names sources/transforms/sinks from the same
  * library surface the code-first API uses — every `op` maps to a
  * reference transformer (tokenize → TextWordTokenizerTransformer,
  * derive → OneToOneItemAttributesTransformer, unique →
  * UniqueFilterTransformer, count_by → ReduceItemTransformer.count,
  * select/drop → copy/remove_key_paths, filter → ignore_word_fn) and
  * column expressions are Spark SQL strings (`expr(...)` — still
  * declarative, still codegen'd, no UDFs). Assembly produces a single
  * DataFrame plan, so Catalyst optimizes ACROSS config steps exactly
  * as it does the code-first pipelines: at 100 TB a config-assembled
  * job and its hand-written twin run the same physical plan
  * (spec-pinned bit-equality).
  *
  * Unknown ops / malformed configs fail loudly at assembly time — a
  * typo'd pipeline must not silently no-op.
  */
object PipelineConfig {

  // Shared field accessors: EVERY config read goes through these so a
  // missing or mistyped field raises the same loud assembly error —
  // (sink \ "path").values-style extraction silently stringifies
  // JNothing into a junk value (a sink writing to a dir named "None").
  private def str(j: JValue, field: String): String = j \ field match {
    case JString(s) => s
    case JNothing   => sys.error(s"pipeline config: missing '$field' in ${JsonMethods.compact(j)}")
    case other      => sys.error(s"pipeline config: '$field' must be a string, got $other")
  }
  private def strs(j: JValue, field: String): Seq[String] = j \ field match {
    case JArray(xs) => xs.map { case JString(s) => s; case o => sys.error(s"'$field': $o") }
    case _          => sys.error(s"pipeline config: '$field' must be an array of strings")
  }

  /** Assemble the config's source + transforms into a DataFrame plan
    * (no action). `baseDir` resolves relative table/file paths.
    */
  def assemble(spark: SparkSession, json: String, baseDir: String = ""): DataFrame = {
    val root = JsonMethods.parse(json)
    val source = root \ "source"
    def resolve(p: String): String =
      if (p.startsWith("/") || baseDir.isEmpty) p else s"$baseDir/$p"

    val src: DataFrame = str(source, "type") match {
      case "table" =>
        spark.read.parquet(s"${resolve(str(source, "dir"))}/${str(source, "name")}.parquet")
      case "text_files" =>
        val pattern = source \ "pattern" match { case JString(s) => s; case _ => "*.txt" }
        val whole = (source \ "wholetext") match { case JBool(b) => b; case _ => false }
        if (whole) graft.sources.TextFiles.wholeText(spark, pattern, resolve(str(source, "path")))
        else graft.sources.TextFiles.lines(spark, pattern, resolve(str(source, "path")))
      case other => sys.error(s"pipeline config: unknown source type '$other'")
    }

    val transforms = root \ "transforms" match {
      case JArray(ts) => ts
      case JNothing   => Nil
      case other      => sys.error(s"pipeline config: 'transforms' must be an array, got $other")
    }
    transforms.foldLeft(src) { (df, t) =>
      str(t, "op") match {
        case "tokenize" =>
          val from = str(t, "col"); val to = str(t, "to")
          val arabic = (t \ "arabic") match { case JBool(b) => b; case _ => false }
          if (arabic)
            df.select(col("*"), explode(graft.operators.TextFunctions.arabicTokens(col(from))).as(to))
          else
            df.select(col("*"), explode(split(col(from), "\\s+")).as(to))
              .filter(col(to) =!= "")
        case "derive" =>
          (t \ "cols") match {
            case JObject(fields) => fields.foldLeft(df) {
              case (d, (name, JString(sql))) => d.withColumn(name, expr(sql))
              case (_, (name, o)) => sys.error(s"derive '$name': expression must be a string, got $o")
            }
            case _ => sys.error("pipeline config: derive needs an object of name -> SQL expr")
          }
        case "filter"   => df.filter(expr(str(t, "where")))
        case "select"   => df.select(strs(t, "cols").map(col): _*)
        case "drop"     => df.drop(strs(t, "cols"): _*)
        case "unique"   => df.dropDuplicates(strs(t, "by"))
        case "count_by" =>
          df.groupBy(strs(t, "by").map(col): _*)
            .agg(count(lit(1)).as(str(t, "as")))
        case "noop"     => df
        case other      => sys.error(s"pipeline config: unknown op '$other'")
      }
    }
  }

  /** Assemble and run the sink action. Returns the assembled frame so
    * callers can inspect what was written.
    *
    * `jdbc` is the config twin of the reference's DB loaders
    * (MySQL_DBLoader / the py-beam settings.json output switch,
    * v2/core/loaders/mysql.py:10): `url` + `table` required,
    * `batchsize`/`num_partitions`/`mode` optional — the same partition-
    * parallel batched writer [[graft.sinks.Sinks.jdbc]] the code-first
    * Flagship `--db` path uses. NOTE the default mode is the reference
    * loader's APPEND (each run inserts its batch) — unlike the csv/
    * parquet sinks, a re-run grows the table; set `"mode":
    * "overwrite"` for idempotent re-runs.
    */
  def run(spark: SparkSession, json: String, baseDir: String = ""): DataFrame = {
    val df = assemble(spark, json, baseDir)
    val sink = JsonMethods.parse(json) \ "sink"
    def optInt(field: String): Option[Int] = sink \ field match {
      case JInt(i)  => Some(i.toInt)
      case JNothing => None
      case other    => sys.error(s"pipeline config: '$field' must be an integer, got $other")
    }
    sink \ "type" match {
      case JString("csv")     => graft.sinks.Sinks.csv(df, str(sink, "path"))
      case JString("parquet") => df.write.mode("overwrite").parquet(str(sink, "path"))
      case JString("jdbc")    => graft.sinks.Sinks.jdbc(df, str(sink, "url"), str(sink, "table"),
        batchSize = optInt("batchsize").getOrElse(1000),
        numPartitions = optInt("num_partitions"),
        mode = sink \ "mode" match {
          case JString(m) => m
          case JNothing   => "append"
          case other      => sys.error(s"pipeline config: 'mode' must be a string, got $other")
        })
      case JString("noop")    => graft.sinks.Sinks.noop(df): Unit
      case JNothing           => () // sink-less config: assembly only
      case other              => sys.error(s"pipeline config: unknown sink $other")
    }
    df
  }
}
