package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Blocked fuzzy record linkage (entity resolution) — the curation
  * step that reconciles a dirty registry against the master table
  * when the join key itself is noisy. Classic Fellegi–Sunter shape:
  *
  *   block on the CLEAN structured fields (brand, size) so the
  *   quadratic comparison is bounded per block, then edit-distance
  *   the noisy name only inside the block, then argmin per probe.
  *
  * At 100 TB the block key is the shuffle key and each block's
  * candidate set is the only quadratic surface — blocks are
  * dimension-bounded (|brands|·|sizes|), so the comparison count is
  * Σ|block|² regardless of corpus size; an unblocked levenshtein
  * join would be the cartesian this repo bans. `levenshtein` is a
  * codegen'd builtin on both engines.
  *
  * The dirty registry is DERIVED deterministically (one character of
  * the name substituted at an md5-chosen position — the
  * `domain_mix`/`q_train_split` md5 idiom, no RNG state), so the
  * oracle rebuilds the identical registry and the linkage quality is
  * itself gated: every probe must link back within distance 1, and
  * `exact_back = 0` rows are exactly the probes whose name collides
  * with a lexicographically-smaller twin part (TPC-H-ish names are
  * few; ambiguity is real and reported, not hidden).
  */
object Linkage {

  /** One-char-perturbed copy of `p_name` per part, keyed by the
    * origin partkey; perturbation position is md5-derived so both
    * engines mint the same registry.
    */
  private def dirtyRegistryOf(part: DataFrame): DataFrame = {
    val pos = (conv(substring(md5(concat(lit("perturb:"),
      col("p_partkey").cast("string"))), 1, 8), 16, 10).cast("long")
      % length(col("p_name")) + 1).as("pos")
    part
      .select(col("p_partkey").as("r_id"), col("p_brand"), col("p_size"),
        col("p_name"), pos)
      .select(col("r_id"), col("p_brand"), col("p_size"),
        concat(
          col("p_name").substr(lit(1), col("pos") - 1),
          lit("q"),
          col("p_name").substr(col("pos") + 1, length(col("p_name"))))
          .as("dirty_name"))
  }

  /** Link every dirty registry row back to the master part table:
    * block-join on (brand, size), levenshtein ≤ `tau` inside the
    * block, best match = lexicographic min of (distance, partkey) —
    * resolved as two exact aggregates (min distance, then min key at
    * that distance) because a single argmin's tie behavior is
    * engine-defined. Output is the per-probe linkage manifest.
    */
  def fuzzyLinkageOf(part: DataFrame, tau: Int = 2): DataFrame = {
    val dirty = dirtyRegistryOf(part)
    val cand = dirty.join(
        part.select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name")),
        Seq("p_brand", "p_size"))
      .select(col("r_id"), col("dirty_name"), col("p_partkey"),
        levenshtein(col("dirty_name"), col("p_name")).as("dist"))
      .filter(col("dist") <= tau)
    // ONE aggregate: min(struct(dist, p_partkey)) IS (best_dist,
    // min partkey among best-dist candidates) — the struct orders by
    // dist first, partkey second, exactly the old best+pick pair of
    // passes. The previous form joined `cand` back to itself, so the
    // levenshtein candidate scan (the query's CPU) executed twice.
    val best = cand.groupBy(col("r_id"))
      .agg(min(struct(col("dist"), col("p_partkey"))).as("m"),
        count(lit(1)).as("n_cands"))
      .select(col("r_id"), col("m.dist").as("best_dist"),
        col("m.p_partkey").as("matched_partkey"), col("n_cands"))
    dirty.select(col("r_id"), col("dirty_name"))
      .join(best, Seq("r_id"), "left")
      .select(col("r_id"), col("dirty_name"),
        col("best_dist").cast("long").as("best_dist"),
        col("n_cands"), col("matched_partkey"),
        when(col("matched_partkey") === col("r_id"), 1).otherwise(0).as("exact_back"))
      .orderBy("r_id")
  }

  def fuzzyLinkage(t: Tables): DataFrame = fuzzyLinkageOf(t.part)

  def fuzzyLinkageSql(tau: Int = 2): String =
    s"""WITH reg AS (
       |  SELECT p_partkey AS r_id, p_brand, p_size, p_name,
       |    (('0x' || substr(md5('perturb:' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT
       |      % length(p_name)) + 1 AS pos
       |  FROM part
       |), dirty AS (
       |  SELECT r_id, p_brand, p_size,
       |    substr(p_name, 1, CAST(pos - 1 AS INT)) || 'q'
       |      || substr(p_name, CAST(pos + 1 AS INT), length(p_name)) AS dirty_name
       |  FROM reg
       |), cand AS (
       |  SELECT d.r_id, d.dirty_name, p.p_partkey,
       |    levenshtein(d.dirty_name, p.p_name) AS dist
       |  FROM dirty d JOIN part p ON d.p_brand = p.p_brand AND d.p_size = p.p_size
       |  WHERE levenshtein(d.dirty_name, p.p_name) <= $tau
       |), best AS (
       |  SELECT r_id, min(dist) AS best_dist, count(*) AS n_cands
       |  FROM cand GROUP BY r_id
       |), pick AS (
       |  SELECT c.r_id, min(c.p_partkey) AS matched_partkey
       |  FROM cand c JOIN best b ON c.r_id = b.r_id AND c.dist = b.best_dist
       |  GROUP BY c.r_id
       |)
       |SELECT d.r_id, d.dirty_name, CAST(b.best_dist AS BIGINT) AS best_dist,
       |  b.n_cands, p.matched_partkey,
       |  CASE WHEN p.matched_partkey = d.r_id THEN 1 ELSE 0 END AS exact_back
       |FROM dirty d LEFT JOIN best b USING (r_id) LEFT JOIN pick p USING (r_id)
       |ORDER BY d.r_id""".stripMargin
}
