package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PCA / whitening over the embeddings table — the classic
  * preprocessing stage in front of every quantizer in this repo
  * (OPQ-style rotation before [[Similarity.pqCodes]], decorrelation
  * before [[Similarity.sqTopK]]'s per-dim ranges, isotropy repair
  * before cosine ANN).
  *
  * Scale architecture — the moment trick: PCA needs only the d×d
  * second-moment matrix and the d-vector mean, both LINEAR one-pass
  * aggregations over the corpus. Rows explode to (i, j, xᵢ·xⱼ) cells
  * and partial aggregation collapses them map-side, so the shuffle
  * carries ≤ d² rows per partition regardless of corpus size — at
  * 100 TB the reduce side still sees a few thousand doubles. The d×d
  * result is a bounded model parameter (the [[Similarity]]
  * `maxExactRows` policy: guarded loud, d ≤ 256 ⇒ ≤ 64k cells), the
  * eigensolve is a driver-side Jacobi on that tiny matrix, and the
  * eigenbasis goes back OUT as a broadcast literal for a fully
  * distributed, map-only projection. The corpus is scanned exactly
  * twice (moments; projection) and no vector ever crosses a shuffle.
  *
  * No DuckDB twin exists for the eigensolve, so the gated rows are
  * rows-only by declared policy (the `embed_ivf_kmeans` precedent);
  * PcaSpec pins the invariants that MAKE it a PCA: orthonormal basis,
  * eigen-residuals ≈ 0, diagonal projected covariance with sorted
  * eigenvalues, whitened covariance ≈ I, Σλ = total variance, and a
  * deterministic sign convention.
  */
object Pca {

  /** Hard ceiling on the driver-side eigenproblem; d beyond this is a
    * different algorithm (randomized SVD), not a bigger collect.
    */
  val maxDim = 256

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** One-pass distributed moments: (n, mean[d], cov[d][d]).
    * Covariance is the unbiased-free population form Σ(x−μ)(x−μ)ᵀ/n =
    * S/n − μμᵀ, assembled on the driver from the aggregated cells.
    */
  def moments(embeddings: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    val cells = embeddings
      .select(posexplode(asDouble(col("embedding"))).as(Seq("i", "xi")))
    // loud empty-input failure (ADVICE r11): max(i) over zero rows is
    // NULL and the getInt below would throw an opaque NPE
    val maxRow = cells.agg(max(col("i"))).collect()(0)
    require(!maxRow.isNullAt(0), "Pca.moments: embeddings input is empty — nothing to fit")
    val d0 = maxRow.getInt(0) + 1
    require(d0 <= maxDim,
      s"embedding dim $d0 exceeds Pca.maxDim=$maxDim — use a sketch/randomized method at this width")
    // Σxᵢ and n from the linear cells; Σxᵢxⱼ (upper triangle) from the
    // self-paired cells — one nested explode, all map-side combined
    val lin = cells.groupBy("i").agg(sum(col("xi")).as("s"), count(lit(1)).as("cnt"))
      .collect()
    // ragged vectors would silently mis-normalize mean/cov if n were
    // taken as a max — demand every dimension present in every vector
    val cnts = lin.map(_.getLong(2))
    val n = cnts.max
    require(cnts.forall(_ == n) && lin.length == d0,
      s"Pca.moments: ragged embeddings — per-dimension counts ${cnts.min}..${cnts.max} over $d0 dims; " +
        "every vector must carry all dimensions")
    val s = Array.ofDim[Double](d0)
    lin.foreach(r => s(r.getInt(0)) = r.getDouble(1))
    val quad = embeddings
      .select(asDouble(col("embedding")).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), posexplode(col("v")).as(Seq("j", "xj")), col("xi"))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("sij"))
      .collect()
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d0, d0)
    quad.foreach { r =>
      val (i, j, sij) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val c = sij / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    (n, mean, cov)
  }

  /** Cyclic-Jacobi eigensolve for a symmetric matrix: deterministic
    * sweep order (upper triangle row-major), fixed convergence
    * threshold — same input bits, same output bits, every run. Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending, each vector sign-normalized so its
    * largest-magnitude component is positive (ties to the lower
    * index), which removes the ±v ambiguity from every downstream
    * artifact.
    */
  def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-14) {
            off += apq * apq
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x   => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sgn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sgn * akq
              a(k)(q) = sgn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sgn * aqk
              a(q)(k) = sgn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sgn * vkq
              v(k)(q) = sgn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // sign convention: largest-|component| positive, ties lower index
      var best = 0
      var bk = 1
      while (bk < d) { if (math.abs(col(bk)) > math.abs(col(best))) best = bk; bk += 1 }
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** Fit on the corpus: eigen-decomposed covariance, ready to project. */
  final case class PcaModel(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    def varianceTotal: Double = eigenvalues.sum
  }

  def fit(embeddings: DataFrame): PcaModel = {
    val (n, mean, cov) = moments(embeddings)
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(n, mean, evals, evecs)
  }

  /** Gated rows: the scree table — per retained component its
    * eigenvalue, variance share and cumulative share. k rows, the
    * training-pipeline artifact you read before choosing a target
    * dimensionality.
    */
  def componentsQuery(t: Tables, k: Int = 16): DataFrame = {
    val spark = t.embeddings.sparkSession
    import spark.implicits._
    val model = fit(t.embeddings)
    val tot = model.varianceTotal
    val rows = model.eigenvalues.take(k).zipWithIndex.scanLeft((0L, 0.0, 0.0, 0.0)) {
      case ((_, _, _, cum), (ev, i)) =>
        (i.toLong, math.rint(ev * 1e6) / 1e6,
          math.rint(ev / tot * 1e6) / 1e6, cum + ev / tot)
    }.drop(1).map { case (i, ev, ratio, cum) =>
      (i, ev, ratio, math.rint(cum * 1e6) / 1e6)
    }
    spark.createDataset(rows.toSeq)
      .toDF("component", "eigenvalue", "var_ratio", "cum_ratio")
      .orderBy("component")
  }

  /** Distributed projection y = Vₖ·(x − μ), optionally whitened
    * (yᵢ/√λᵢ — unit covariance out). Map-only: the k×d basis and the
    * mean ride the plan as literals (a few KB), each output component
    * is one codegen'd [[graft.functions.VectorFunctions.dot]] against
    * the centered vector, and the input's partitioning is untouched.
    */
  def project(embeddings: DataFrame, model: PcaModel, k: Int,
      whiten: Boolean = false): DataFrame = {
    import graft.functions.VectorFunctions
    require(k >= 1 && k <= model.components.length, s"k=$k out of range")
    val meanLit = array(model.mean.map(lit(_)).toIndexedSeq: _*)
    val centered = zip_with(asDouble(col("embedding")), meanLit, (x, m) => x - m)
    val comps = (0 until k).map { i =>
      val basis = array(model.components(i).map(lit(_)).toIndexedSeq: _*)
      val y = VectorFunctions.dot(centered, basis)
      val scaled = if (whiten) y / lit(math.sqrt(math.max(model.eigenvalues(i), 1e-300))) else y
      scaled.as(s"y$i")
    }
    embeddings.select(col("vec_id") +: comps: _*)
  }

  /** Two-stage ANN with a PCA shortlist — the matrix-sketch sibling of
    * [[Similarity.sqTopK]]'s int8 two-stage: rank ALL candidates by
    * cosine in the kDim-dimensional principal subspace (each approx
    * score costs kDim mults instead of d), keep `shortlist` per query,
    * then exact-cosine re-rank only those. With `shortlist ≥ corpus`
    * the result is BIT-equal to [[Similarity.cosineTopK]] (same
    * rounding, same tie-break) — the spec's equivalence anchor; below
    * that, recall is governed by how much variance kDim captures
    * (clustered corpora concentrate variance in few components, the
    * case PCA exists for; isotropic corpora are its worst case).
    *
    * Scale shape: the reduction is map-only against broadcast basis
    * literals; the approx pass scans reduced vectors once per query
    * batch (broadcast queries); only (query, candidate-id) pairs —
    * `shortlist` per query — reach the exact re-rank. Same plan family
    * as the other two-stage rows, so the 100 TB reasoning carries over.
    */
  def pcaTopK(t: Tables, nQueries: Int = 10, k: Int = 5, kDim: Int = 8,
      shortlist: Int = 256): DataFrame = {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.expressions.Window
    val model = fit(t.embeddings)
    val yArr = array((0 until kDim).map(i => col(s"y$i")): _*)
    val red = project(t.embeddings, model, kDim)
      .select(col("vec_id"), yArr.as("rv"))
      .withColumn("rnrm", VectorFunctions.l2norm(col("rv")))
    val rq = red.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("rv").as("qrv"), col("rnrm").as("qrnrm"))
    // zero-norm guard: a vector collapsing to ~the mean has no
    // direction in the subspace — scored below every real candidate
    // rather than riding a NaN to the top of the DESC sort (Spark
    // orders NaN above +Inf)
    val approx = red.join(broadcast(rq), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        when(col("rnrm") * col("qrnrm") > 0,
          VectorFunctions.dot(col("qrv"), col("rv")) / (col("rnrm") * col("qrnrm")))
          .otherwise(lit(-2.0)).as("approx_sim"))
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_sim").desc, col("vec_id"))
    val cand = approx.withColumn("r", row_number().over(wa))
      .filter(col("r") <= shortlist).select("query_id", "vec_id")
    val emb = t.embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorFunctions.l2norm(col("v")))
    val qe = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    cand
      .join(emb, Seq("vec_id"))
      .join(broadcast(qe), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(we).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Parametric OPQ (Ge et al. 2013, "OPQ-P"): product quantization
    * works best when every subspace carries EQUAL variance and dims
    * are decorrelated — raw embeddings give neither. The parametric
    * fix: rotate into the PCA eigenbasis (decorrelates), then PERMUTE
    * the principal dims into the m subspaces by eigenvalue allocation
    * — greedily assign dims in descending-λ order to the open bucket
    * with the smallest log-variance product — so no subspace hoards
    * all the signal. Returns the m dim-index buckets.
    */
  def opqAllocate(eigenvalues: Array[Double], m: Int): Array[Array[Int]] = {
    val d = eigenvalues.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val cap = d / m
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logProd = Array.fill(m)(0.0)
    // descending λ with index-order tie-break (eigenvalues are sorted
    // already; iterate in order)
    eigenvalues.indices.foreach { i =>
      val open = (0 until m).filter(b => buckets(b).size < cap)
      val best = open.minBy(b => (logProd(b), b))
      buckets(best) += i
      logProd(best) += math.log(math.max(eigenvalues(i), 1e-300))
    }
    buckets.map(_.toArray)
  }

  /** The OPQ-P rotation: eigenbasis rows re-ordered by the allocation
    * (bucket 0's dims first, then bucket 1's, …) — a permutation of an
    * orthonormal basis, so still orthonormal; subspace s of the
    * rotated vector is exactly bucket s's principal components.
    */
  def opqRotation(model: PcaModel, m: Int): Array[Array[Double]] =
    opqAllocate(model.eigenvalues, m).flatMap(_.map(model.components))

  /** PQ codes in the OPQ-rotated space — same naive first-k codebook
    * scheme as [[Similarity.pqCodes]] (the comparison must isolate the
    * ROTATION, so everything else matches), same explode/broadcast
    * plan shape, with the rotation applied map-only via broadcast
    * literal rows before sub-vector slicing. Rows-only (the rotation
    * derives from the eigensolve); PcaSpec pins the orthonormality/
    * balance invariants and the quantization-error dominance that is
    * OPQ's entire point.
    */
  def opqCodes(t: Tables, m: Int = 4, k: Int = 16): DataFrame = {
    val model = fit(t.embeddings)
    opqCodesWith(t.embeddings, model.mean, opqRotation(model, m), m, k)
  }

  /** The shared plan, parameterized by the rotation — the spec passes
    * the identity here to measure the UNROTATED (centered-only)
    * baseline with everything else bit-identical, isolating the
    * rotation's contribution.
    */
  def opqCodesWith(embeddings: DataFrame, mean: Array[Double],
      rot: Array[Array[Double]], m: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val d = rot.length
    // public and reachable via identityRotation (ADVICE r11): without
    // this mirror of opqAllocate's guard a non-divisible d silently
    // drops the trailing d % m dims from every subvector
    require(m >= 1 && d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val slices = embeddings.sparkSession.sparkContext.defaultParallelism
    val meanLit = array(mean.map(lit(_)).toIndexedSeq: _*)
    val centered = zip_with(asDouble(col("embedding")), meanLit, (x, mu) => x - mu)
    val rotated = array((0 until d).map { i =>
      VectorFunctions.dot(centered, array(rot(i).map(lit(_)).toIndexedSeq: _*))
    }: _*)
    val sub = embeddings
      .repartition(slices, col("vec_id"))
      .select(col("vec_id"), rotated.as("v"))
      .select(col("vec_id"), explode(array((0 until m).map { s =>
        struct(lit(s.toLong).as("s"), slice(col("v"), s * subDim + 1, subDim).as("sv"))
      }: _*)).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))
    val cb = sub.filter(col("vec_id") < k)
      .select(col("vec_id").as("code"), col("s").as("cs"), col("sv").as("cv"))
    val sqDist = aggregate(zip_with(col("sv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    sub.join(broadcast(cb), col("s") === col("cs"))
      .withColumn("dist", sqDist)
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col("vec_id"), col("s"), col("best.code").as("code"),
        round(col("best.dist"), 6).as("sq_err"))
      .orderBy("vec_id", "s")
  }

  /** Identity rotation for the spec baseline. */
  def identityRotation(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  /** HASH-GATED verdict grid for the OPQ rotation (r13: the codes
    * themselves derive from the eigensolve, so they stay a library
    * artifact — [[opqCodes]], dominance-spec'd in PcaSpec). The grid
    * gates the two properties that DEFINE a correct OPQ-P rotation,
    * per subspace s:
    *   - `ortho_ok`: subspace s's rows of R are orthonormal against
    *     ALL rows of R within `tol` (RᵀR = I at 1e-6 — a non-eigen
    *     basis, duplicated row, or unnormalized eigenvector lands O(1)
    *     away; the Jacobi solver's residual is ~1e-12).
    *   - `balance_ok`: the eigenvalue-allocation's log-variance spread
    *     max_b Σlogλ − min_b Σlogλ under the greedy balanced
    *     allocation is ≤ the naive contiguous split's spread (the
    *     DOMINANCE that is OPQ-P's entire point: contiguous slicing of
    *     a descending spectrum concentrates all variance in subspace
    *     0). Global property, asserted on every row of the grid.
    * The rotation is driver-sized (d ≤ 256 rows from the distributed
    * moment fit — the projectGate shape); the oracle re-derives the
    * subspace grid.
    */
  def opqGate(t: Tables, m: Int = 4, tol: Double = 1e-6): DataFrame = {
    val spark = t.embeddings.sparkSession
    import spark.implicits._
    val model = fit(t.embeddings)
    val rot = opqRotation(model, m)
    val d = rot.length
    val subDim = d / m
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def spread(buckets: Seq[Seq[Int]]): Double = {
      val lps = buckets.map(_.map(i => math.log(math.max(model.eigenvalues(i), 1e-300))).sum)
      lps.max - lps.min
    }
    val balanced = opqAllocate(model.eigenvalues, m).toSeq.map(_.toSeq)
    val naive = (0 until m).map(s => (s * subDim) until ((s + 1) * subDim): Seq[Int])
    val balanceOk = spread(balanced) <= spread(naive) + 1e-9
    val rows = (0 until m).map { s =>
      val orthoOk = (s * subDim until (s + 1) * subDim).forall { i =>
        (0 until d).forall { j =>
          val target = if (i == j) 1.0 else 0.0
          math.abs(dot(rot(i), rot(j)) - target) <= tol
        }
      }
      (s.toLong, orthoOk, balanceOk)
    }
    spark.createDataset(rows).toDF("s", "ortho_ok", "balance_ok").orderBy("s")
  }

  def opqGateSql(m: Int = 4): String =
    s"""SELECT s, true AS ortho_ok, true AS balance_ok
       |FROM range(0, $m) t(s) ORDER BY s""".stripMargin

  /** Gated rows-only projection sample: first 4 whitened components of
    * every vector, 6dp — deterministic end-to-end (deterministic
    * moments: pairwise-exact? no — see note) — determinism here rides
    * the FIXED aggregation tree of a same-conf run plus the Jacobi
    * solver's fixed sweep order; across conf changes values may drift
    * in the last ulps, which is why this row is rows-only, not
    * hash-gated.
    */
  def projectQuery(t: Tables, k: Int = 4): DataFrame = {
    val model = fit(t.embeddings)
    project(t.embeddings, model, k, whiten = true)
      .select(col("vec_id") +:
        (0 until k).map(i => round(col(s"y$i"), 6).as(s"y$i")): _*)
      .orderBy("vec_id")
  }

  /** Hash-gated end-to-end check on the whitened projection (r11
    * verdict #4). DuckDB cannot re-derive the Jacobi eigensolve, so the
    * per-vector projections stay rows-only — but the invariants that
    * DEFINE a correct whitened PCA projection are checkable: over the
    * full corpus, E[yᵢyⱼ] = δᵢⱼ and E[yᵢ] = 0. A wrong mean, a
    * non-eigen basis, mis-ordered eigenvalues, or a botched 1/√λ
    * scaling each push a moment O(1) away from its target — far beyond
    * the 1e-3 gate (numerical slack is ~1e-10: exact-by-construction
    * diagonalization to the solver's 1e-12 off-diagonal threshold).
    * The verdict grid is what the driver hash-compares; the oracle
    * re-derives the expected grid independently. Distributed shape:
    * one map-only projection pass + one k(k+1)/2-cell aggregate.
    */
  def projectGate(t: Tables, k: Int = 4, tol: Double = 1e-3): DataFrame = {
    val spark = t.embeddings.sparkSession
    import spark.implicits._
    val model = fit(t.embeddings)
    val y = project(t.embeddings, model, k, whiten = true)
    val aggs = (for { i <- 0 until k; j <- i until k }
      yield sum(col(s"y$i") * col(s"y$j")).as(s"m_${i}_$j")) ++
      (0 until k).map(i => sum(col(s"y$i")).as(s"s_$i")) :+ count(lit(1)).as("n")
    val r = y.agg(aggs.head, aggs.tail: _*).head
    val n = r.getAs[Long]("n").toDouble
    val rows = for { i <- 0 until k; j <- i until k } yield {
      val m = r.getAs[Double](s"m_${i}_$j") / n
      val target = if (i == j) 1.0 else 0.0
      val meanOk = math.abs(r.getAs[Double](s"s_$i") / n) <= tol &&
        math.abs(r.getAs[Double](s"s_$j") / n) <= tol
      (i.toLong, j.toLong, math.abs(m - target) <= tol, meanOk)
    }
    spark.createDataset(rows).toDF("ci", "cj", "moment_ok", "mean_ok")
      .orderBy("ci", "cj")
  }

  def projectGateSql(k: Int = 4): String =
    s"""SELECT ci, cj, true AS moment_ok, true AS mean_ok
       |FROM range(0, $k) a(ci), range(0, $k) b(cj)
       |WHERE cj >= ci
       |ORDER BY ci, cj""".stripMargin
}
