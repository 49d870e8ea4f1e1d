package graft

import org.apache.spark.sql.DataFrame

/** The reference's ThreadedPipeline (/root/reference v2/core/pipline.py)
  * is an extractor → transformer-chain → loaders DAG wired with queues
  * and processes. Spark-first, a pipeline is just function composition
  * over DataFrames: Catalyst sees the whole chain as ONE plan and
  * optimizes across stage boundaries (pushdown through every stage,
  * fused codegen) — something the queue-per-stage design forecloses.
  */
object Pipeline {
  type Stage = DataFrame => DataFrame

  /** Compose stages left-to-right. */
  def apply(stages: Stage*): Stage =
    stages.foldLeft(identity[DataFrame] _)(_ andThen _)

  /** OneToOneNoopTransformer analog (v2/core/transformers/commons.py:76). */
  val noop: Stage = identity

  /** Apply `stage` only when `cond` — ConditionalLoader's transform twin. */
  def when(cond: Boolean)(stage: Stage): Stage = if (cond) stage else noop
}
