package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`array<float>`, 64-dim).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k. The query set is broadcast, the
  *    data side streams once through a codegen'd `cosine_similarity`, and
  *    the per-query top-k is a rank-limited window — Spark inserts a
  *    partial WindowGroupLimit before the shuffle, so each input partition
  *    forwards at most k rows per query (no all-rows-to-one-task funnel).
  *    Cost: one full scan per batch of queries — the right baseline, and
  *    exact.
  *  - [[annTopK]]: sign-random-projection LSH. Each vector gets
  *    `numTables` bucket ids at scan time (codegen'd sketch, no stored
  *    model); query and data meet in a bucket equi-join, candidates are
  *    ranked by exact cosine. Sub-linear candidate volume, tunable
  *    recall/cost via (tables × bits) — the 100 TB path where a full scan
  *    per query batch is unaffordable.
  */
object Similarity {
  private val T = Tables

  /** Shared rank-and-limit tail of every top-k path: rank on the ROUNDED
    * score with an id tiebreak → deterministic. One definition so a
    * tie-rule change can never make the exact/LSH/IVF paths diverge. */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    cand
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("qid", "vec_id", "cos", "rn")
      .orderBy("qid", "rn")
  }

  /** Exact cosine top-k for each query vector. */
  def bruteTopK(data: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    val scored = data
      .crossJoin(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .withColumn("cos", round(expr("cosine_similarity(qv, embedding)"), 6))
    rankTopK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * query (anchor), the k MOST-similar vectors with a DIFFERENT label.
    * These near-misses are what make a contrastive / retrieval model
    * learn boundaries; random negatives are too easy to carry signal.
    * Same scan shape as [[bruteTopK]] (queries broadcast, one data pass,
    * rank-limited window) with the label-mismatch predicate applied
    * BEFORE scoring — the 100 TB refinement swaps the scan for
    * [[annTopK]]/[[ivfTopK]] candidates with oversampled k and the same
    * label filter on the verified tail. */
  def hardNegatives(data: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      col("label").as("qlabel"))
    val scored = data
      .join(broadcast(q), col("label") =!= col("qlabel"))
      .withColumn("cos", round(expr("cosine_similarity(qv, embedding)"), 6))
    rankTopK(scored, k)
  }

  /** Approximate cosine top-k: LSH bucket join + exact re-rank of
    * candidates. Recall is the probability a true neighbor shares at
    * least one of `numTables` buckets: 1-(1-p^numBits)^numTables with
    * p = 1 - θ/π. Tune up for clustered corpora, out for random ones. */
  def annTopK(data: DataFrame, queries: DataFrame, k: Int,
              numTables: Int = 16, numBits: Int = 8): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    def sketched(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
          posexplode(expr(s"cosine_lsh_sketch(embedding, $numTables, $numBits)"))
            .as(Seq("t", "bucket")))
        .select(col(idAs), col("t"), col("bucket"))
    // ids ONLY through the bucket join and the collision dedup (same
    // discipline as [[nearDupPairs]]): a pair colliding in several of the
    // tables would otherwise shuffle both vectors once per collision.
    // Vectors are fetched exactly once per surviving candidate — the query
    // side by broadcast, the data side by an id equi-join.
    val candIds = sketched(data, "vec_id")
      .join(broadcast(sketched(queries, "qid")), Seq("t", "bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select("qid", "vec_id")
      .distinct() // a pair may collide in several tables
    val cand = candIds
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))), "qid")
      .join(data.select(col("vec_id"), col("embedding").as("v")), "vec_id")
      .withColumn("cos", round(expr("cosine_similarity(qv, v)"), 6))
    rankTopK(cand, k)
  }

  /** IVF (inverted-file) approximate top-k — the OTHER classic ANN
    * family next to [[annTopK]]'s LSH: a KMeans coarse quantizer assigns
    * every vector to one of `nlist` cells; a query probes only its
    * `nprobe` nearest cells and exact-ranks those candidates.
    *
    * Scale shape: training samples once (MLlib KMeans, deterministic
    * seed — or pass a pre-trained `quantizer` so production callers
    * train once per corpus snapshot and reuse it across query batches),
    * assignment is one map-side model.transform, and probe selection is
    * itself distributed: the `nlist` centroids (tiny by construction)
    * become a broadcast table, every query ranks its cells with the same
    * codegen'd cosine + windowed-rank tail the search uses, and only
    * (qid, cell) id pairs move. No driver-side collect in this method —
    * but the query batch is still BROADCAST to the scoring join, so it
    * remains bounded by contract (broadcast limits apply); what changed
    * vs the collect formulation is that probe selection no longer
    * funnels through driver memory or a driver-side loop. The search
    * then reads ~nprobe/nlist of the corpus — the fraction IS the
    * speed/recall knob. `nprobe == nlist` degenerates to exact brute force
    * (SimilaritySpec pins that), which LSH cannot do without infinite
    * tables. Vectors are ranked by cosine; cell residence comes from
    * euclidean KMeans, so recall at small nprobe depends on how
    * clusterable the corpus is (weak on near-orthogonal synthetic data,
    * strong on real embedding clouds — same caveat as LSH recall).
    *
    * Kept out of the declared query pack deliberately: a `queries()`
    * entry would re-TRAIN the quantizer inside every bench run and
    * measure MLlib fit, not search.
    */
  def ivfTopK(data: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    GraftFunctions.ensureRegistered(data.sparkSession)
    val spark = data.sparkSession
    import spark.implicits._
    val model = quantizer.getOrElse(trainQuantizer(data, nlist))
    val featured = data.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val assigned = model.transform(featured).select("vec_id", "embedding", "cl")
    // the centroid TABLE is nlist rows — driver-tiny by construction
    // (it lives in the fitted model, not collected from data)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq.toDF("cl", "cv")
    // pin the query batch ONCE: it feeds probe selection AND the scoring
    // broadcast, and a nondeterministic query plan (sample, unordered
    // limit) re-scanned twice could probe one row set and score another
    // — the same hazard the old collect-once formulation guarded against
    val qv = queries
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
      .localCheckpoint(false)
    // rank cells per query: cosine distance, NaN (zero-norm vector) → 1.0
    // i.e. "orthogonal", ties broken by cell id — all computed where the
    // queries live, queries × nlist narrow rows through the window
    val probeW = Window.partitionBy("qid").orderBy(col("cdist"), col("cl"))
    val probes = qv
      .join(broadcast(centroids))
      .withColumn("cdist",
        lit(1.0) - nanvl(expr("cosine_similarity(qv, cv)"), lit(0.0)))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select("qid", "cl")
    val cand = assigned
      .join(broadcast(probes), "cl")
      .filter(col("qid") =!= col("vec_id"))
      .join(broadcast(qv), "qid")
      .withColumn("cos", round(expr("cosine_similarity(qv, embedding)"), 6))
    rankTopK(cand, k)
  }

  /** Train the IVF coarse quantizer once (deterministic seed); pass the
    * result to [[ivfTopK]]'s `quantizer` so repeated query batches skip
    * the fit. */
  /** @param maxIter Lloyd rounds for the coarse fit. The default keeps
    *                 MLlib's; the declared IVF-PQ recall row passes a
    *                 smaller budget — coarse cells only ROUTE vectors,
    *                 the exact re-rank tail forgives rough centers, and
    *                 each MLlib iteration is a scheduled Spark job. */
  def trainQuantizer(data: DataFrame, nlist: Int, maxIter: Int = 20)
      : org.apache.spark.ml.clustering.KMeansModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    new KMeans().setK(nlist).setSeed(42).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cl")
      .fit(data.select(array_to_vector(col("embedding")).as("features")))
  }

  /** INT8 embedding quantization — the storage-compression step vector
    * stores run before indexing (4× over float32; composes with PQ's
    * 32× for the coarse tier): per-vector symmetric scale
    * `s = max|vᵢ|/127`, codes `round(vᵢ/s) ∈ [−127,127]`, dequant error
    * ≤ s/2 per coordinate by construction. Everything is per-row
    * arithmetic on the scan — no shuffle, no model — and every step
    * (float→double widening, division, round-half-away-from-zero) is
    * bit-identical across engines, so the codes themselves are
    * oracle-checkable, not just their shape. A zero vector quantizes to
    * all-zero codes with scale 0 (kept, not dropped). */
  def int8Quantize(data: DataFrame): DataFrame =
    data.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", aggregate(col("e"), lit(0.0),
        (acc, x) => greatest(acc, abs(x))) / 127.0)
      .withColumn("codes", transform(col("e"),
        x => when(col("scale") === 0.0, lit(0))
          .otherwise(round(x / col("scale"), 0)).cast("int")))

  /** QS7 — [[int8Quantize]] end to end: per-vector scale and an md5
    * over the exact code array (a hash match proves every one of the
    * n_dims integers identical cross-engine), plus the s/2 dequant
    * error bound re-verified IN-PLAN as a certified boolean — a
    * rounding regression flips it. */
  def qsInt8Quant(spark: SparkSession, d: String): DataFrame =
    int8Quantize(T.embeddings(spark, d))
      .withColumn("err", aggregate(
        zip_with(col("codes"), col("e"), (c, x) => abs(c * col("scale") - x)),
        lit(0.0), (acc, x) => greatest(acc, x)))
      .select(col("vec_id"),
        round(col("scale"), 9).as("scale_r"),
        size(col("codes")).cast("long").as("n_dims"),
        md5(concat_ws(",", transform(col("codes"), _.cast("string")))).as("codes_md5"),
        (col("err") <= col("scale") / 2 * 1.0000001).as("err_within_bound"))
      .orderBy("vec_id")

  /** SEMANTIC dedup — the SemDeDup recipe (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", public knowledge): k-means clusters the embedding
    * space, then near-duplicate detection runs ONLY within each cluster
    * — the clustering is what makes the quadratic pair step local, so
    * total pair work is Σ|c|² ≈ n²/k instead of n². Removal rule is
    * deterministic min-id domination: a vector is removed iff some
    * SMALLER-id vector in its cluster is ≥ `minCos` similar (the
    * smallest member of every duplicate neighborhood always survives;
    * no RNG, no centroid-distance tie to break).
    *
    * Scale shape: one model.transform assigns clusters map-side; the
    * within-cluster self-join shuffles by cluster id — pick `nClusters`
    * ∝ n / target-cluster-size to bound per-task pair work (the
    * published recipe's knob), and pre-train the quantizer on a sample
    * via [[trainQuantizer]] for a 100 TB corpus. Identical vectors are
    * ALWAYS co-clustered (assignment is a deterministic function of the
    * vector), which is what lets the query row below certify exact-copy
    * removal regardless of what the clustering converged to.
    *
    * Returns (vec_id, cluster, kept). */
  def semanticDedup(data: DataFrame, nClusters: Int, minCos: Double,
                    quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    GraftFunctions.ensureRegistered(data.sparkSession)
    val model = quantizer.getOrElse(trainQuantizer(data, nClusters))
    val assigned = model.transform(data.select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features")))
      .select("vec_id", "embedding", "cl")
    val removed = assigned.as("a").join(assigned.as("b"),
        col("a.cl") === col("b.cl") && col("a.vec_id") < col("b.vec_id") &&
          expr("cosine_similarity(a.embedding, b.embedding)") >= minCos)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select("vec_id", "cl")
      .join(removed.withColumn("_rm", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl").cast("long").as("cluster"),
        col("_rm").isNull.as("kept"))
  }

  /** Product-quantization codebooks: `m` subspaces of `subDim` dims, each
    * with 2^nbits centroids — `codebooks(s)(c)` is centroid c of
    * subspace s. The whole model is m·2^nbits·subDim doubles (kilobytes):
    * it ships to executors as an expression LITERAL, never a join. */
  case class PqModel(m: Int, subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.length == m && codebooks.forall(_.forall(_.length == subDim)))
    def codes: Int = codebooks.head.length
  }

  /** Train PQ codebooks (per-subspace k-means, deterministic seeds) —
    * the MEMORY-bound ANN family next to [[annTopK]]'s LSH and
    * [[ivfTopK]]'s IVF: at 100 TB of embeddings the working set, not
    * the compute, is the binding constraint, and PQ stores m bytes per
    * vector (64-dim float = 256 B → 8 B at m=8, nbits=4 ⇒ 32×) while
    * queries scan the CODES with table lookups instead of the vectors
    * with float math. Like [[trainQuantizer]], train once per corpus
    * snapshot and reuse; [[qsPqRecall]] puts the full train→encode→
    * ADC→re-rank path under the driver's correctness gate.
    *
    * PQ training is a SAMPLE-bound computation by design (the FAISS
    * production recipe — public knowledge: codebooks are fit on 10⁴-10⁶
    * sampled vectors regardless of corpus size, because 2^nbits
    * centroids per 4-8-dim subspace saturate long before that). So:
    * ONE bounded `limit(sampleCap).collect()` (CollectLimit short-
    * circuits the scan — no sort, no full pass), then Lloyd's algorithm
    * for all m subspaces locally. The alternative — m separate MLlib
    * fits — costs ~10 scheduled Spark jobs per subspace (init + one per
    * iteration); measured 16-19 s for m=16 on this corpus vs < 1 s
    * here, with the job-scheduling overhead, not the math, dominating.
    * At 100 TB the collect is the SAME few megabytes.
    * Deterministic END TO END: when `sampleOrderCol` is present the
    * sample is the top-`sampleCap` rows by `(xxhash64(id), id)` — a
    * TakeOrdered (bounded per-partition heap, no full sort) whose result
    * is a pseudo-random subset INDEPENDENT of file/partition layout, so
    * codebooks survive testdata regens and repartitions. The hash order
    * does cost one full pass over the corpus at train time; pass
    * `sampleOrderCol = None` to fall back to a bare CollectLimit (reads
    * just enough partitions, but the chosen rows then depend on layout —
    * determinism only for a fixed set of files). Lloyd itself is seeded
    * and iteration-ordered, so equal samples give equal codebooks.
    *
    * @param maxIter   Lloyd rounds per subspace; codebooks only need
    *                  reasonable diversity — an exact re-rank tail
    *                  forgives coarse centers.
    * @param sampleCap max training vectors pulled to the driver.
    * @param sampleOrderCol unique id column making the sample
    *                  layout-stable; ignored if absent from `data`. */
  def trainPq(data: DataFrame, m: Int = 8, nbits: Int = 4,
              maxIter: Int = 20, sampleCap: Int = 16384,
              sampleOrderCol: Option[String] = Some("vec_id")): PqModel = {
    val emb = col("embedding").cast("array<double>").as("emb")
    val sampled = sampleOrderCol.filter(data.columns.contains) match {
      case Some(id) =>
        data.select(emb, col(id).as("_ord"))
          .orderBy(xxhash64(col("_ord")), col("_ord")).limit(sampleCap)
      case None => data.select(emb).limit(sampleCap)
    }
    val rows = sampled.select("emb").collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "trainPq: empty training sample")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val k = 1 << nbits
    val codebooks = Array.tabulate(m) { s =>
      val pts = rows.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      lloyd(pts, k, maxIter, seed = 42 + s)
    }
    PqModel(m, subDim, codebooks)
  }

  /** Local Lloyd with k-means++ seeding — deterministic for a fixed
    * seed and point order. Empty clusters respawn on the point farthest
    * from its center (the standard repair). */
  private def lloyd(pts: Array[Array[Double]], k: Int, maxIter: Int,
                    seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val n = pts.length
    val d = pts.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ init
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = pts(rnd.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < n) {
        val dd = dist2(pts(i), centers(c - 1))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
      val total = minD.sum
      if (total <= 0) centers(c) = pts(rnd.nextInt(n)).clone()
      else {
        var r = rnd.nextDouble() * total; var j = 0
        while (j < n - 1 && r > minD(j)) { r -= minD(j); j += 1 }
        centers(c) = pts(j).clone()
      }
      c += 1
    }
    val assign = Array.fill(n)(-1)
    var iter = 0
    var moved = true
    while (moved && iter < maxIter) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bd = dist2(pts(i), centers(0)); var j = 1
        while (j < k) {
          val dd = dist2(pts(i), centers(j))
          if (dd < bd) { bd = dd; best = j }
          j += 1
        }
        if (best != assign(i)) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k, d)(0.0)
      val cnt = Array.fill(k)(0)
      var p = 0
      while (p < n) {
        val a = assign(p); cnt(a) += 1
        var j = 0
        while (j < d) { sums(a)(j) += pts(p)(j); j += 1 }
        p += 1
      }
      var j = 0
      while (j < k) {
        if (cnt(j) > 0) {
          var q = 0
          while (q < d) { centers(j)(q) = sums(j)(q) / cnt(j); q += 1 }
        } else {
          // respawn an empty cluster on the point farthest from its center
          var far = 0; var fd = -1.0; var i2 = 0
          while (i2 < n) {
            val dd = dist2(pts(i2), centers(assign(i2)))
            if (dd > fd) { fd = dd; far = i2 }
            i2 += 1
          }
          centers(j) = pts(far).clone()
          moved = true
        }
        j += 1
      }
      iter += 1
    }
    centers
  }

  private def codebookLit(model: PqModel) =
    typedlit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)

  /** Encode every vector to its m nearest-centroid codes — one
    * scan-side declarative pass (nested higher-order functions over the
    * codebook literal; no UDF, no join): the compressed representation a
    * PQ index stores. */
  def pqEncode(data: DataFrame, model: PqModel): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    data
      .withColumn("_cb", codebookLit(model))
      // native codegen kernel (functions/Vector.scala): the HOF form
      // (nested transform/aggregate/zip_with) allocates lambda frames
      // per (subspace, centroid, dim) and runs interpreted — encoding
      // runs once per corpus row at index build, the same
      // expression-is-the-workload argument as pq_adc/cosine.
      // FunctionsSpec pins native ≡ HOF ([[pqEncodeHof]]) bit-for-bit.
      .withColumn("codes", expr("pq_encode(embedding, _cb)"))
      .select(col("vec_id"), col("codes"))
  }

  /** A servable PQ index: the trained codebooks plus the encoded corpus
    * — what production actually stores between the (rare) index build
    * and the (constant) query traffic. [[buildPqIndex]] →
    * [[savePqIndex]] at build time; [[loadPqIndex]] → [[pqTopK]] with
    * `codes = Some(index.codes)` at serving time, so neither training
    * nor encoding reruns per query. */
  case class PqIndex(model: PqModel, codes: DataFrame)

  /** Train + encode in one pass over the corpus snapshot. */
  def buildPqIndex(data: DataFrame, m: Int = 8, nbits: Int = 4,
                   maxIter: Int = 20, sampleCap: Int = 16384): PqIndex = {
    val model = trainPq(data, m, nbits, maxIter, sampleCap)
    PqIndex(model, pqEncode(data, model))
  }

  /** Persist a PQ index as two parquet tables: `codebook` — one row per
    * (subspace, code) centroid, the whole model in m·2^nbits rows — and
    * `codes` — m small ints per corpus vector, the compressed corpus.
    * The codebook is driver-sized (kilobytes) and written as one file;
    * the codes table keeps its partitioning — at 100 TB it IS the index
    * and writes distributed like any other table. */
  def savePqIndex(index: PqIndex, dir: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    val cb = index.model.codebooks.zipWithIndex.flatMap { case (cbS, s) =>
      cbS.zipWithIndex.map { case (c, ci) => (s, ci, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "center")
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    index.codes.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Load a stored PQ index. The codebook collect is bins-sized by
    * design (m·2^nbits rows); codes stay a distributed table.
    * SimilaritySpec pins save→load→serve ≡ the retrained path
    * bit-for-bit; [[qsPqRecall]] runs the stored path under the
    * driver's gate. */
  def loadPqIndex(spark: SparkSession, dir: String): PqIndex = {
    val rows = spark.read.parquet(s"$dir/codebook")
      .select("subspace", "code", "center").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"loadPqIndex: empty codebook at $dir/codebook")
    val m = rows.map(_._1).max + 1
    val codebooks = Array.tabulate(m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    val model = PqModel(m, codebooks.head.head.length, codebooks)
    PqIndex(model, spark.read.parquet(s"$dir/codes"))
  }

  /** The declarative HOF encode, kept as the differential oracle for
    * the native kernel (FunctionsSpec) — semantics frozen here. */
  private[graft] def pqEncodeHof(data: DataFrame, model: PqModel): DataFrame = {
    val sd = model.subDim
    data
      .withColumn("_cb", codebookLit(model))
      .withColumn("_d", expr(
        s"""transform(_cb, (cb, s) -> transform(cb, c -> aggregate(
              zip_with(slice(CAST(embedding AS array<double>), s * $sd + 1, $sd), c,
                (a, b) -> (a - b) * (a - b)), 0D, (x, y) -> x + y)))"""))
      .withColumn("codes", expr(
        "transform(_d, ds -> array_position(ds, array_min(ds)) - 1)"))
      .select(col("vec_id"), col("codes").cast("array<int>").as("codes"))
  }

  /** PQ-ADC approximate top-k: queries precompute per-subspace
    * inner-product lookup tables against the codebook literal (scan-side,
    * still no driver work), the CODES table is scanned once per query
    * batch with m table-lookup adds per vector — the asymmetric-distance
    * scan that makes PQ the memory-bound family's workhorse — and the
    * best `rerank·k` candidates per query are re-ranked with exact
    * cosine on the true vectors. `rerank` covering the whole corpus
    * degenerates to exact brute force (SimilaritySpec pins it, like
    * IVF's nprobe == nlist). */
  def pqTopK(data: DataFrame, queries: DataFrame, k: Int, model: PqModel,
             rerank: Int = 4, codes: Option[DataFrame] = None): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    val sd = model.subDim
    // stored-index serving: pass the persisted codes table and the scan
    // side never re-encodes the corpus
    val codesDf = codes.getOrElse(pqEncode(data, model))
    val qlut = queries
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("_cb", codebookLit(model))
      .withColumn("lut", expr(
        s"""transform(_cb, (cb, s) -> transform(cb, c -> aggregate(
              zip_with(slice(qv, s * $sd + 1, $sd), c, (a, b) -> a * b),
              0D, (x, y) -> x + y)))"""))
      .select("qid", "lut")
    val candW = Window.partitionBy("qid").orderBy(col("approx").desc, col("vec_id"))
    // native codegen'd kernel — the HOF form (aggregate ∘ zip_with) runs
    // interpreted per (vector, query); FunctionsSpec pins their equality
    val cand = codesDf.crossJoin(broadcast(qlut))
      .withColumn("approx", expr("pq_adc(codes, lut)"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("crn", row_number().over(candW))
      .filter(col("crn") <= rerank * k)
      .select("qid", "vec_id")
    cand
      .join(data.select(col("vec_id"), col("embedding").as("v")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv2"))), "qid")
      .withColumn("cos", round(expr("cosine_similarity(qv2, v)"), 6))
      .transform(rankTopK(_, k))
  }

  /** A servable IVF-PQ index: the coarse-cell centroids, the residual
    * PQ codebooks, and per vector its (cell, codes) row — everything
    * the probe/ADC/re-rank serving path needs. The MLlib KMeansModel is
    * a BUILD-time object only (it assigns corpus vectors to cells);
    * serving needs just the centroid table, so the stored artifact is
    * three parquet tables, no MLlib persistence. */
  case class IvfPqIndex(centroids: Seq[(Int, Seq[Double])], model: PqModel,
                        codes: DataFrame)

  /** Build the IVF-PQ index: route vectors to coarse cells, PQ-train on
    * the residual stream, encode. The residual stream is materialized
    * ONCE (lazy local checkpoint): it has three consumers — the PQ
    * training sample, the encode scan, and the cell-id join — and each
    * would otherwise re-execute the MLlib assignment transform
    * upstream (measured ~2× on the declared recall row). */
  def buildIvfPqIndex(data: DataFrame, nlist: Int = 16, m: Int = 8, nbits: Int = 4,
                      quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None,
                      pq: Option[PqModel] = None): IvfPqIndex = {
    import org.apache.spark.ml.functions.array_to_vector
    GraftFunctions.ensureRegistered(data.sparkSession)
    val spark = data.sparkSession
    import spark.implicits._
    val model = quantizer.getOrElse(trainQuantizer(data, nlist))
    val featured = data.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val assigned = model.transform(featured).select("vec_id", "embedding", "cl")
    val centroidSeq = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
    val centroids = centroidSeq.toDF("cl", "cv")
    val residuals = assigned.join(broadcast(centroids), "cl")
      .select(col("vec_id"), col("cl"),
        zip_with(col("embedding").cast("array<double>"), col("cv"),
          (a, b) => a - b).as("embedding"))
      .localCheckpoint(false)
    val pqm = pq.getOrElse(trainPq(residuals, m, nbits))
    val codes = pqEncode(residuals, pqm)
      .join(residuals.select("vec_id", "cl"), "vec_id")
    IvfPqIndex(centroidSeq, pqm, codes)
  }

  /** Persist an IVF-PQ index: `centroids` (nlist rows) + `codebook`
    * (m·2^nbits rows) — both driver-sized — and the distributed `codes`
    * table (vec_id, cl, codes). */
  def saveIvfPqIndex(index: IvfPqIndex, dir: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.centroids.toDF("cl", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    savePqIndex(PqIndex(index.model, index.codes), dir)
  }

  /** Load a stored IVF-PQ index; SimilaritySpec pins save→load→serve ≡
    * the freshly-built path bit-for-bit. */
  def loadIvfPqIndex(spark: SparkSession, dir: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("cl", "cv").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    require(cents.nonEmpty, s"loadIvfPqIndex: empty centroids at $dir/centroids")
    val pqi = loadPqIndex(spark, dir)
    IvfPqIndex(cents, pqi.model, pqi.codes)
  }

  /** Serve IVF-PQ queries from a (built or loaded) index: probe, build
    * per-(query, cell) LUTs over the query residual, ADC-scan ONLY the
    * probed cells' codes, re-rank exactly against `data`. */
  def ivfPqServe(data: DataFrame, queries: DataFrame, k: Int, index: IvfPqIndex,
                 nprobe: Int = 4, rerank: Int = 4): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    val spark = data.sparkSession
    import spark.implicits._
    val centroids = index.centroids.toDF("cl", "cv")
    val pqm = index.model
    val codes = index.codes
    // probe selection: identical to ivfTopK
    val qv = queries
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      .filter(col("qv").isNotNull)
      .localCheckpoint(false)
    val probeW = Window.partitionBy("qid").orderBy(col("cdist"), col("cl"))
    val probes = qv
      .join(broadcast(centroids))
      .withColumn("cdist",
        lit(1.0) - nanvl(expr("cosine_similarity(qv, cv)"), lit(0.0)))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= nprobe)
      .select("qid", "cl", "qv", "cv")
    // per-(query, cell) lookup table over the QUERY RESIDUAL — inner
    // product with code centroids approximates <q - c, v - c>, the
    // within-cell geometry PQ quantized
    val sd = pqm.subDim
    val luts = probes
      .withColumn("qres", zip_with(col("qv"), col("cv"), (a, b) => a - b))
      .withColumn("_cb", codebookLit(pqm))
      .withColumn("lut", expr(
        s"""transform(_cb, (cb, s) -> transform(cb, c -> aggregate(
              zip_with(slice(qres, s * $sd + 1, $sd), c, (a, b) -> a * b),
              0D, (x, y) -> x + y)))"""))
      .select("qid", "cl", "lut")
    val candW = Window.partitionBy("qid").orderBy(col("approx").desc, col("vec_id"))
    val cand = codes.join(broadcast(luts), "cl") // only probed cells scan
      .withColumn("approx", expr("pq_adc(codes, lut)"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("crn", row_number().over(candW))
      .filter(col("crn") <= rerank * k)
      .select("qid", "vec_id")
    cand
      .join(data.select(col("vec_id"), col("embedding").as("v")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv2"))), "qid")
      .withColumn("cos", round(expr("cosine_similarity(qv2, v)"), 6))
      .transform(rankTopK(_, k))
  }

  /** IVF-PQ: the composition of [[ivfTopK]] and [[pqTopK]] into the
    * production index layout (the FAISS `IVFx,PQy` workhorse — public
    * knowledge), as one call: [[buildIvfPqIndex]] then [[ivfPqServe]].
    * The coarse quantizer routes vectors to cells; PQ encodes each
    * vector's RESIDUAL against its cell centroid (residuals cluster far
    * tighter than raw vectors, so the same codebook budget quantizes
    * them much more accurately); a query probes `nprobe` cells and
    * ADC-scans only those cells' codes with a per-(query, cell) lookup
    * table built from the query's own residual; candidates re-rank
    * exactly. Storage: m bytes + one cell id per vector; compute: the
    * probed fraction of the corpus at m lookup-adds per vector — both
    * knobs independent. Same train-once contract as its two parents
    * (pass `quantizer`/`pq` from a prior fit, or build once and serve
    * many via the index functions); deliberately not a declared
    * query. */
  def ivfPqTopK(data: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8, nbits: Int = 4,
                quantizer: Option[org.apache.spark.ml.clustering.KMeansModel] = None,
                pq: Option[PqModel] = None, rerank: Int = 4): DataFrame =
    ivfPqServe(data, queries, k,
      buildIvfPqIndex(data, nlist, m, nbits, quantizer, pq), nprobe, rerank)

  /** Embedding-cosine near-duplicate pairs: LSH sketch self-join on
    * (table, bucket) generates candidates, exact cosine verifies — the
    * embedding twin of [[Dedup.minhashPairs]], never all-pairs. Table
    * count trades cost for recall at the target threshold
    * (1-(1-p^bits)^tables, p = 1-θ/π): at cos 0.45 and 96×6, per-pair
    * recall ≈ 0.999; for a true near-dup threshold (≥0.9) a handful of
    * tables is already certain. */
  def nearDupPairs(data: DataFrame, minCos: Double,
                   numTables: Int = 96, numBits: Int = 6): DataFrame = {
    GraftFunctions.ensureRegistered(data.sparkSession)
    // ids ONLY through the bucket join: a pair colliding in many tables
    // produces many candidate rows, and carrying the vectors would
    // shuffle |candidates| × vector-width bytes. Dedupe the narrow id
    // pairs first, then fetch each side's vector once for the verify
    // (measured 10.2 s -> ~3 s at sf0.1).
    val sk = data.select(col("vec_id"),
      posexplode(expr(s"cosine_lsh_sketch(embedding, $numTables, $numBits)"))
        .as(Seq("t", "bucket")))
    val cands = sk.as("a")
      .join(sk.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("da"), col("b.vec_id").as("db"))
      .distinct()
    val vecs = data.select(col("vec_id"), col("embedding"))
    cands
      .join(vecs.withColumnRenamed("vec_id", "da").withColumnRenamed("embedding", "va"), "da")
      .join(vecs.withColumnRenamed("vec_id", "db").withColumnRenamed("embedding", "vb"), "db")
      .withColumn("cos", round(expr("cosine_similarity(va, vb)"), 6))
      .filter(col("cos") >= minCos)
      .select("da", "db", "cos")
      .orderBy("da", "db")
  }

  /** [[nearDupPairs]] with LSH geometry derived from the corpus instead
    * of fixed: `numBits` targets a constant bucket occupancy
    * (≈ log2(N / targetOccupancy)), `numTables` then hits `recallTarget`
    * for a worst-case pair at exactly `minCos`
    * (tables = ln(1-recall) / ln(1-p^bits), p = 1-θ/π).
    *
    * WHY (measured, PERF.md round-4 scale smoke): with bits FIXED, bucket
    * occupancy grows linearly in N, the bucket self-join quadratically —
    * 10× the corpus made the fixed 96×6 declared query 25× slower
    * (~300M candidate rows from 20k vectors). Occupancy-targeted bits
    * keep per-bucket work constant, so candidate volume stays ~linear in
    * N at a FIXED similarity threshold. The table clamp (512) is the
    * honesty valve: a low `minCos` on a near-orthogonal corpus can demand
    * more tables than any budget (p^bits vanishes) — LSH cannot be both
    * high-recall and sub-quadratic there; production near-dup thresholds
    * (≥ 0.9) stay cheap at any N. Costs one `count()` job up front.
    */
  def nearDupPairsAuto(data: DataFrame, minCos: Double,
                       recallTarget: Double = 0.999,
                       targetOccupancy: Int = 32): DataFrame = {
    require(minCos > 0.0 && minCos < 1.0, s"minCos in (0,1), got $minCos")
    require(recallTarget > 0.0 && recallTarget < 1.0, "recallTarget in (0,1)")
    val (tables, bits) = lshGeometry(data.count(), minCos, recallTarget, targetOccupancy)
    nearDupPairs(data, minCos, numTables = tables, numBits = bits)
  }

  /** The sizing rule of [[nearDupPairsAuto]] as a pure function
    * (tables, bits) — exposed for tests and for callers that know N. */
  private[graft] def lshGeometry(n: Long, minCos: Double, recallTarget: Double,
                                 targetOccupancy: Int): (Int, Int) = {
    val bits = math.min(24, math.max(4,
      math.ceil(math.log(math.max(n, 1).toDouble / targetOccupancy) / math.log(2)).toInt))
    val p = 1.0 - math.acos(minCos) / math.Pi
    val tables = math.min(512, math.max(1,
      math.ceil(math.log1p(-recallTarget) / math.log1p(-math.pow(p, bits))).toInt))
    (tables, bits)
  }

  // ---- query-pack entries ----

  /** QS1 — exact cosine top-10 for the first five vectors as queries. */
  def qsCosineTopK(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d)
    bruteTopK(e, e.filter(col("vec_id") < 5), k = 10)
  }

  /** QS2 — LSH ANN, SELF-CERTIFYING: the row emits, per query, whether
    * the ANN top-10 recovered at least `CertifiedHits` of the exact
    * top-10 — both computed IN THE SAME PLAN ([[annTopK]] vs
    * [[bruteTopK]], one semi-join and a count). DuckDB can't reproduce
    * the xxhash64 sketch, but it doesn't have to: the oracle asserts the
    * certified floor (`true` for every query), so the driver's hash
    * check now PINS recall ≥ 0.7 per query instead of recording a
    * rows-only pass — any LSH regression flips a boolean and fails the
    * hash. Deterministic: fixed corpus, fixed seeds, fixed geometry.
    *
    * 48 tables × 5 bits: measured per-query hits ≥ 8/10 at sf0.001,
    * sf0.01 AND sf0.1 on this corpus (near-orthogonal vectors — ANN's
    * worst case; clustered real-world embeddings do better at the same
    * cost); the floor of 7 leaves one-hit headroom at every SF. */
  val CertifiedHits = 7L

  def qsAnnLsh(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d)
    val q = e.filter(col("vec_id") < 5)
    val exact = bruteTopK(e, q, k = 10).select("qid", "vec_id")
    val ann = annTopK(e, q, k = 10, numTables = 48, numBits = 5).select("qid", "vec_id")
    val hits = exact.join(ann, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    q.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left") // a 0-hit query must still report
      .select(col("qid"), lit(10L).as("k"),
        (coalesce(col("hits"), lit(0L)) >= CertifiedHits).as("recall_ge_certified"))
      .orderBy("qid")
  }

  /** QS3 — embedding near-dup pairs at the PRODUCTION threshold
    * (cos ≥ 0.9) over the corpus plus 20 planted near-identical clones
    * (donor × 1.001 in float — the [[qsSemanticDedup]] planted-truth
    * pattern): the output is exactly the 20 (donor, clone) pairs, which
    * DuckDB reproduces by brute force, so the oracle pins LSH recall at
    * the operating point near-dup dedup actually runs.
    *
    * Two scale lessons are baked in, both measured on the 10× corpus:
    * (1) AUTO geometry, not the fixed 96×6 default — fixed bits mean
    * bucket occupancy grows linearly in N and the bucket self-join
    * quadratically (4 s → 146 s, ≈30G candidate rows, before the
    * switch); (2) a production threshold, not 0.45 — below the corpus's
    * natural similarity (max pairwise cos ≈ 0.51) the recall formula
    * demands table counts that hit the 512 clamp (p^bits vanishes) and
    * the SKETCH pass itself goes super-linear (24× at 10× data even
    * with auto bits; the [[nearDupPairsAuto]] honesty valve, now kept
    * out of the declared row's operating point). At cos 0.9 the auto
    * geometry stays occupancy-constant AND table-cheap at any N. */
  def qsEmbedNearDup(spark: SparkSession, d: String): DataFrame = {
    val base = T.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        expr("transform(embedding, x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT))")
          .as("embedding"))
    nearDupPairsAuto(base.unionAll(planted), minCos = 0.9)
  }

  /** QS4 — per-label embedding centroids (the class-mean step behind
    * nearest-centroid classification, IVF coarse training, and embedding
    * quality monitoring). posexplode → groupBy(label, dim) with map-side
    * partial aggregation: the shuffle carries only labels×dims partial
    * sums per partition regardless of corpus size. Float summation order
    * differs across engines/partitionings, so each element is cast to an
    * exact DECIMAL first (the float→decimal widening is per-element and
    * deterministic); the single double division at the end is IEEE-exact
    * on identical inputs. */
  def qsCentroid(spark: SparkSession, d: String): DataFrame =
    T.embeddings(spark, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(sum(col("v").cast(DecimalType(18, 9))).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        round(col("s").cast("double") / col("n"), 6).as("c"), col("n"))
      .orderBy("label", "dim")

  /** QS5 — [[semanticDedup]] end to end with planted exact clones:
    * every vec_id ≡ 5 (mod 17) vector takes the embedding of vec_id−3,
    * and the threshold (0.95) sits far above the corpus's max natural
    * pairwise cosine (≈ 0.51), so the removed set is EXACTLY the
    * planted clones — closed-form in DuckDB without reproducing the
    * clustering, because identical vectors co-cluster under ANY fitted
    * model. One hash row pins the full pipeline: injection, k-means
    * assignment, within-cluster pair generation, threshold, and the
    * min-id domination rule (the donor, being smaller, must survive;
    * any false removal of a natural vector flips a row). */
  def qsSemanticDedup(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d).select("vec_id", "embedding")
    val donors = e.select(col("vec_id").as("donor_id"),
      col("embedding").as("donor_emb"))
    val injected = e
      .withColumn("donor_id", when(col("vec_id") % 17 === 5, col("vec_id") - 3))
      .join(donors, Seq("donor_id"), "left")
      .withColumn("embedding", coalesce(col("donor_emb"), col("embedding")))
      .select("vec_id", "embedding")
    semanticDedup(injected, nClusters = 16, minCos = 0.95)
      .select("vec_id", "kept")
      .orderBy("vec_id")
  }

  /** QS7 — stored-PQ recall, SELF-CERTIFYING (the [[qsAnnLsh]] pattern
    * applied to the memory-bound ANN family): train PQ codebooks, encode
    * the corpus, ADC-scan + exact re-rank, and compare against the exact
    * top-10 IN THE SAME PLAN — the row emits, per query, whether PQ
    * recovered ≥ [[PqCertifiedHits]] of the exact non-self top-10.
    * DuckDB can't reproduce 8 KMeans fits, and doesn't have to: the
    * oracle asserts the certified floor, so the driver's hash check pins
    * PQ recall per query — a codebook/encode/ADC/re-rank regression
    * flips a boolean and fails the hash. This puts the production index
    * layout (train once, scan codes) under the driver's gate where it
    * was previously spec-only.
    *
    * Self-matches are excluded on BOTH sides (pqTopK already drops them;
    * the exact side takes top-11 and drops self) so the comparison is
    * over the same candidate universe. Geometry is sized for this
    * corpus's worst case (near-orthogonal random vectors, where coarse
    * PQ cells barely separate neighbors): m=16 subspaces × 64 centroids
    * quantizes 4-dim slices finely, and rerank=16 re-ranks 160
    * candidates exactly. Measured per-query hits: 10/10 at sf0.001 and
    * sf0.01, ≥ 9/10 at sf0.1 (the default m=8/nbits=4/rerank=8 bottoms
    * at 5/10 here — measured, which is exactly why this row exists);
    * the floor of 7 leaves two-hit headroom. KMeans seeds are fixed; the
    * floor — not the model bits — is the certified claim, so
    * partitioning-induced center drift cannot flip the row. */
  val PqCertifiedHits = 7L

  def qsPqRecall(spark: SparkSession, d: String): DataFrame = {
    // NOT fanned out: the KMeans fits re-execute their input per
    // iteration, so an added exchange multiplies across iterations
    // (measured 1.5 s -> 2.1 s at sf0.1)
    val e = T.embeddings(spark, d)
    val q = e.filter(col("vec_id") < 5)
    // the STORED-index lifecycle under the gate: build → persist →
    // load → serve. Queries run against the loaded artifact (codebook
    // rows + parquet codes), not the in-memory model, so a store/load
    // regression — not just a train/encode one — flips the row.
    val idxDir = Fixtures.dir("pq-index", d)
    savePqIndex(buildPqIndex(e, m = 16, nbits = 6, maxIter = 8), idxDir)
    val idx = loadPqIndex(spark, idxDir)
    val selfW = Window.partitionBy("qid").orderBy("rn")
    val exact = bruteTopK(e, q, k = 11)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("rn2", row_number().over(selfW))
      .filter(col("rn2") <= 10)
      .select("qid", "vec_id")
    val approx = pqTopK(e, q, 10, idx.model, rerank = 16,
      codes = Some(idx.codes)).select("qid", "vec_id")
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    q.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left") // a 0-hit query must still report
      .select(col("qid"), lit(10L).as("k"),
        (coalesce(col("hits"), lit(0L)) >= PqCertifiedHits).as("recall_ge_certified"))
      .orderBy("qid")
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009 — public knowledge):
    * merge two ranked lists by Σ 1/(k + rank), the standard way hybrid
    * search combines lexical (BM25) and semantic (vector) retrieval
    * without score calibration — ranks, not scores, fuse, so the two
    * lists' incomparable scales never meet. Both inputs are already
    * top-N (bounded); the fusion is a full-outer join on doc id + pure
    * arithmetic — at 100 TB the heavy work happened upstream in the
    * rank-limited retrievers, and RRF touches 2·N rows per query.
    *
    * Determinism: ranks are exact integers; `1.0/(k + rn)` and the
    * two-term sum are identical IEEE ops both engines; fused score
    * rounds 1e-6 and ranks on the ROUNDED value, doc_id tiebreak. */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame,
              kConst: Int = 60, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = lexical.select(col("doc_id"), col("rn").as("rn_lex"))
    val b = semantic.select(col("doc_id"), col("rn").as("rn_sem"))
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kConst) + col("rn_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst) + col("rn_sem")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topN)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rn_lex"), col("rn_sem"), col("rrf"), col("rank"))
      .orderBy("rank")
  }

  /** QS8 — hybrid retrieval end to end: BM25 top-20 for {join, vector,
    * scan} fused with exact cosine top-20 for query vector 0 (the
    * documents and embeddings tables share an id universe by
    * construction). The row pins the full lexical + semantic + fusion
    * composition under one hash. */
  def qsHybridRrf(spark: SparkSession, d: String): DataFrame = {
    val lex = graft.operators.TextAnalysis
      .bm25TopDocs(T.documents(spark, d), Seq("join", "vector", "scan"), topN = 20)
      .select("doc_id", "rn")
    val sem = bruteTopK(T.embeddings(spark, d),
        T.embeddings(spark, d).filter(col("vec_id") === 0), k = 20)
      .select(col("vec_id").as("doc_id"), col("rn"))
    rrfFuse(lex, sem)
  }

  /** QS9 — IVF-PQ recall, SELF-CERTIFYING — the [[qsPqRecall]] contract
    * applied to the composed production layout ([[ivfPqTopK]]: coarse
    * cells route, PQ codes the residuals, probed-cells-only ADC scan,
    * exact re-rank): per query, whether IVF-PQ recovered ≥
    * [[IvfPqCertifiedHits]] of the exact non-self top-10. This corpus is
    * IVF's worst case — near-orthogonal vectors make cell residence
    * weakly informative (the documented caveat) — so the row probes 12
    * of 16 cells: honest about the data while still exercising every
    * layout leg (routing, residual encode, per-(query, cell) LUTs,
    * probed-only scan, re-rank). Measured per-query hits at
    * nprobe=12/m=16/nbits=6/rerank=16: min 8-9 at sf0.001/0.01/0.1
    * (nprobe=8 bottoms at 5 — measured); floor 6 leaves two-hit
    * headroom. Clustered real-world embeddings would hit the same
    * recall at nprobe 2-4. */
  val IvfPqCertifiedHits = 6L

  def qsIvfPqRecall(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d)
    val q = e.filter(col("vec_id") < 5)
    // stored-index lifecycle under the gate, like [[qsPqRecall]]:
    // build → persist (centroids + codebook + codes) → load → serve
    val coarse = trainQuantizer(e, nlist = 16, maxIter = 8)
    val idxDir = Fixtures.dir("ivfpq-index", d)
    saveIvfPqIndex(
      buildIvfPqIndex(e, nlist = 16, m = 16, nbits = 6, quantizer = Some(coarse)),
      idxDir)
    val idx = loadIvfPqIndex(spark, idxDir)
    val selfW = Window.partitionBy("qid").orderBy("rn")
    val exact = bruteTopK(e, q, k = 11)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("rn2", row_number().over(selfW))
      .filter(col("rn2") <= 10)
      .select("qid", "vec_id")
    val approx = ivfPqServe(e, q, 10, idx, nprobe = 12, rerank = 16)
      .select("qid", "vec_id")
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    q.select(col("vec_id").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), lit(10L).as("k"),
        (coalesce(col("hits"), lit(0L)) >= IvfPqCertifiedHits).as("recall_ge_certified"))
      .orderBy("qid")
  }

  /** QS6 — [[hardNegatives]] end to end: top-5 cross-label near-misses
    * for the first five vectors. Oracle = the same label-filtered
    * ranking brute-forced in DuckDB. */
  def qsHardNegatives(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d)
    hardNegatives(e, e.filter(col("vec_id") < 5), k = 5)
  }

  /** Maximal-marginal-relevance re-rank — the diversity stage of the
    * retrieval stack (Carbonell & Goldstein, SIGIR 1998): after a top-N
    * candidate fetch, greedily select k documents maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`, so each pick trades
    * relevance against redundancy with what is already selected. The
    * missing third stage next to [[qsHybridRrf]]'s fusion: BM25/ANN
    * fetch → RRF fuse → MMR diversify is the canonical serving pipeline.
    *
    * Scale shape: the expensive part is the candidate FETCH, which is
    * [[bruteTopK]]/[[annTopK]]/[[ivfPqServe]] — this stage only ever
    * touches the bounded top-N set per query, so the pairwise-similarity
    * join and the selection rounds are per-qid joins/windows over ≤N rows
    * each. The greedy loop is unrolled to a FIXED k at plan time (no
    * data-dependent iteration), and the candidate set + pairwise sims are
    * materialized once (`localCheckpoint`, the in-file discipline) so no
    * round replays the corpus scan. Determinism: every score is computed
    * from 6-rounded doubles with λ = 0.75 (1−λ = 0.25, both exact in
    * binary) and ranked with a vec_id tiebreak — the oracle mirrors the
    * unroll with the identical arithmetic, CTE by CTE.
    *
    * @param cands bounded candidates: (qid, vec_id, rel, v) where `rel`
    *              is the 6-rounded relevance and `v` the vector
    */
  def mmrRerank(cands: DataFrame, k: Int, lambda: Double = 0.75): DataFrame = {
    GraftFunctions.ensureRegistered(cands.sparkSession)
    val base = cands.select("qid", "vec_id", "rel", "v").localCheckpoint(false)
    // all candidate pairs per query: bounded N² per qid, partitioned by qid
    val sims = base.select(col("qid"), col("vec_id").as("a"), col("v").as("va"))
      .join(base.select(col("qid"), col("vec_id").as("b"), col("v").as("vb")), Seq("qid"))
      .filter(col("a") =!= col("b"))
      .withColumn("sim", round(expr("cosine_similarity(va, vb)"), 6))
      .select("qid", "a", "b", "sim")
      .localCheckpoint(false)
    val slim = base.select("qid", "vec_id", "rel")
    val w = Window.partitionBy("qid").orderBy(col("mmr_score").desc, col("vec_id"))
    def argmax(scored: DataFrame, step: Int): DataFrame =
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("qid"), col("vec_id"), lit(step.toLong).as("mmr_rank"),
          col("rel"), col("mmr_score"))
    // step 1: empty selected set ⇒ max-sim term is 0 — pure relevance
    var selected = argmax(
      slim.withColumn("mmr_score", round(lit(lambda) * col("rel"), 6)), 1)
    for (step <- 2 to k) {
      val rest = slim.join(selected.select("qid", "vec_id"),
        Seq("qid", "vec_id"), "left_anti")
      // redundancy of each remaining candidate vs the selected set
      val maxSim = sims
        .join(selected.select(col("qid"), col("vec_id").as("b")), Seq("qid", "b"))
        .groupBy("qid", "a").agg(max("sim").as("max_sim"))
        .withColumnRenamed("a", "vec_id")
      val scored = rest.join(maxSim, Seq("qid", "vec_id"), "left")
        .withColumn("mmr_score", round(
          lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("max_sim"), lit(0.0)), 6))
      // cut lineage per round (the dupClusters discipline): without it
      // each round's plan embeds every prior round's joins — the k=5
      // unroll measured 322 exchanges; with the cut it stays flat
      selected = selected.unionByName(
        argmax(scored.select("qid", "vec_id", "rel", "mmr_score"), step))
        .localCheckpoint(false)
    }
    selected.orderBy("qid", "mmr_rank")
  }

  /** QS12 — [[mmrRerank]] end to end: exact top-20 cosine candidates for
    * the first three query vectors, diversified down to 5 picks at
    * λ = 0.75. Oracle = the same fetch + the same greedy selection
    * unrolled as chained CTEs. */
  def qsMmrRerank(spark: SparkSession, d: String): DataFrame = {
    val e = T.embeddings(spark, d)
    val top = bruteTopK(e, e.filter(col("vec_id") < 3), k = 20)
    // carry vectors into the bounded candidate set (broadcast: ≤60 rows)
    val cands = e.select(col("vec_id"), col("embedding").as("v"))
      .join(broadcast(top), "vec_id")
      .select(col("qid"), col("vec_id"), col("cos").as("rel"), col("v"))
    mmrRerank(cands, k = 5, lambda = 0.75)
  }

  /** Distributed PCA over the embedding corpus — the missing
    * dimensionality-reduction / whitening primitive the similarity
    * family leans on everywhere else (SemDeDup whitens before
    * clustering; IVF/PQ recall improves on decorrelated axes; 64→k
    * projection is the standard cheap-ANN preprocessing).
    *
    * Scale shape — the classic d-bounded factorization: ONE aggregate
    * pass reduces the corpus to a `cov_accum_agg` moment blob
    * (1 + d + d(d+1)/2 doubles; map tasks ship one buffer each, never
    * rows), the d×d eigen-decomposition is driver-side scalar work on
    * that blob ([[graft.functions.CovUtil.jacobiEigen]], cyclic Jacobi —
    * bounded by the embedding WIDTH, independent of corpus size — the
    * Sketches blob-pull discipline), and any projection then runs as a
    * broadcast matrix of k·d literals in plain column math.
    *
    * SELF-CERTIFYING row (the qs_ann_lsh pattern): float eigenvalues
    * can drift in final ulps with partition merge order, so the row
    * emits CERTIFICATES, not raw floats — per-component monotonicity,
    * eigenvector orthonormality (≤1e-9), Rayleigh-quotient match
    * v'Σv ≈ λ (≤1e-9·λ₁), eigenvalue-sum ≈ trace (≤1e-6 relative), and
    * top-k mass ≥ k/d (an exact mathematical floor) — anchored on one
    * EXACT cross-engine number: the covariance trace from per-dim
    * DECIMAL sums (float→double products are exact, casts round
    * deterministically, per-dim contributions integer-scaled before the
    * order-free BIGINT sum — the qt_entropy discipline). */
  /** One-pass PCA train: moment blob → (mean, covariance, eigenpairs).
    * The blob is the ONLY driver pull, d²-sized (scale-free). */
  private def trainPca(e: DataFrame, dims: Int)
      : (Array[Double], Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    GraftFunctions.ensureRegistered(e.sparkSession)
    val blob = e.agg(expr(s"cov_accum_agg(embedding, $dims)")).head()
      .getAs[Array[Byte]](0)
    val buf = graft.functions.CovUtil.fromBytes(blob)
    val mean = buf.sums.map(_ / buf.n.toDouble)
    val cov = graft.functions.CovUtil.covariance(buf)
    val (vals, vecs) = graft.functions.CovUtil.jacobiEigen(cov)
    (mean, cov, vals, vecs)
  }

  /** Project embeddings onto the top-k principal axes: the trained
    * (mean, components) are k·d+d LITERALS baked into plain column
    * arithmetic — a broadcast-free, shuffle-free map over the corpus,
    * exactly how a 64→k reduction runs ahead of ANN at 100 TB. Returns
    * (vec_id, projected array<double>[k]). */
  def pcaProject(e: DataFrame, dims: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= dims, s"pcaProject: k=$k out of range for d=$dims")
    val (mean, _, _, vecs) = trainPca(e, dims)
    val comps = (0 until k).map { c =>
      (0 until dims).map(j =>
        (col("embedding").getItem(j).cast("double") - lit(mean(j))) * lit(vecs(c)(j)))
        .reduce(_ + _).as(s"pc$c")
    }
    e.select(col("vec_id"), array(comps: _*).as("projected"))
  }

  def pcaSummary(e: DataFrame, dims: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= dims, s"pcaSummary: k=$k out of range for d=$dims")
    val (_, cov, vals, vecs) = trainPca(e, dims)
    val d = dims
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val monotoneOk = (0 until d - 1).forall(i => vals(i) >= vals(i + 1) - 1e-12)
    val orthoErr = (for (i <- 0 until d; j <- i until d) yield {
      val dot = (0 until d).map(t => vecs(i)(t) * vecs(j)(t)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
    val rayleighErr = (0 until k).map { c =>
      val sv = (0 until d).map(i =>
        (0 until d).map(j => cov(i)(j) * vecs(c)(j)).sum)
      val q = (0 until d).map(i => vecs(c)(i) * sv(i)).sum
      math.abs(q - vals(c))
    }.max
    val eigSumOk = math.abs(vals.sum - trace) <= 1e-6 * math.abs(trace)
    val topkOk = vals.take(k).sum >= (k.toDouble / d) * trace - 1e-9
    // the exact anchor: per-dim variance from DECIMAL sums of exact
    // double products, integer-scaled before the cross-dim sum
    val perDim = e
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("vd"))
      .groupBy("dim").agg(
        sum(col("vd").cast(DecimalType(38, 20))).as("sv"),
        sum((col("vd") * col("vd")).cast(DecimalType(38, 20))).as("svv"),
        count(lit(1)).as("n"))
      .select(round((col("svv").cast("double") / col("n") -
        (col("sv").cast("double") / col("n")) *
          (col("sv").cast("double") / col("n"))) * 1e9).cast("long").as("vs"))
    val traceRow = perDim.agg(round(sum("vs") / 1e9, 6).as("trace_r"))
    val spark = e.sparkSession
    spark.range(k).select(
        col("id").as("component"),
        lit(monotoneOk).as("evr_monotone_ok"),
        lit(orthoErr <= 1e-9).as("orthonormal_ok"),
        lit(rayleighErr <= 1e-9 * math.max(vals.headOption.getOrElse(1.0), 1e-12))
          .as("rayleigh_ok"),
        lit(eigSumOk).as("eigsum_matches_trace"),
        lit(topkOk).as("topk_mass_ok"))
      .crossJoin(broadcast(traceRow))
      .orderBy("component")
  }

  /** QS13 — [[pcaSummary]] for the 64-dim corpus, top-8 components. */
  def qsPca(spark: SparkSession, d: String): DataFrame =
    pcaSummary(T.embeddings(spark, d), dims = 64, k = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs_pca" -> qsPca _,
    "qs_cosine_topk" -> qsCosineTopK _,
    "qs_ann_lsh" -> qsAnnLsh _,
    "qs_embed_neardup" -> qsEmbedNearDup _,
    "qs_centroid" -> qsCentroid _,
    "qs_semantic_dedup" -> qsSemanticDedup _,
    "qs_hard_negatives" -> qsHardNegatives _,
    "qs_hybrid_rrf" -> qsHybridRrf _,
    "qs_pq_recall" -> qsPqRecall _,
    "qs_ivfpq_recall" -> qsIvfPqRecall _,
    "qs_int8_quant" -> qsInt8Quant _,
    "qs_mmr_rerank" -> qsMmrRerank _)

  /** The [[qsMmrRerank]] oracle: the same candidate fetch, then the same
    * greedy selection UNROLLED as one accumulated CTE per step (a1..a5) —
    * no recursion, identical 6-rounded arithmetic (λ = 0.75 and 0.25 are
    * exact doubles in both engines), identical (score DESC, vec_id)
    * tiebreak. Built by a loop so the per-step SQL cannot drift between
    * steps. */
  private lazy val mmrOracleSql: String = {
    val head =
      "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3), " +
        "sc AS (SELECT qid, vec_id, " +
        "ROUND(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 6) AS rel " +
        "FROM q CROSS JOIN embeddings), " +
        "cand AS (SELECT qid, vec_id, rel FROM (SELECT qid, vec_id, rel, " +
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn FROM sc) " +
        "WHERE rn <= 20), " +
        "pv AS (SELECT c.qid, c.vec_id, e.embedding AS v " +
        "FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id), " +
        "sim AS (SELECT a.qid, a.vec_id AS a, b.vec_id AS b, " +
        "ROUND(list_cosine_similarity(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])), 6) AS sim " +
        "FROM pv a JOIN pv b ON a.qid = b.qid AND a.vec_id <> b.vec_id), " +
        "p1 AS (SELECT qid, vec_id, CAST(1 AS BIGINT) AS mmr_rank, rel, mmr_score " +
        "FROM (SELECT qid, vec_id, rel, ROUND(0.75 * rel, 6) AS mmr_score, " +
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ROUND(0.75 * rel, 6) DESC, vec_id) AS rn " +
        "FROM cand) WHERE rn = 1), " +
        "a1 AS (SELECT * FROM p1)"
    val steps = (2 to 5).map { i =>
      val prev = s"a${i - 1}"
      s", p$i AS (SELECT qid, vec_id, CAST($i AS BIGINT) AS mmr_rank, rel, mmr_score " +
        s"FROM (SELECT c.qid, c.vec_id, c.rel, " +
        s"ROUND(0.75 * c.rel - 0.25 * ms.m, 6) AS mmr_score, " +
        s"ROW_NUMBER() OVER (PARTITION BY c.qid " +
        s"ORDER BY ROUND(0.75 * c.rel - 0.25 * ms.m, 6) DESC, c.vec_id) AS rn " +
        s"FROM cand c JOIN (SELECT s.qid, s.a, MAX(s.sim) AS m FROM sim s " +
        s"JOIN $prev ON s.qid = $prev.qid AND s.b = $prev.vec_id " +
        s"GROUP BY s.qid, s.a) ms ON c.qid = ms.qid AND c.vec_id = ms.a " +
        s"WHERE NOT EXISTS (SELECT 1 FROM $prev " +
        s"WHERE $prev.qid = c.qid AND $prev.vec_id = c.vec_id)) WHERE rn = 1), " +
        s"a$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$i)"
    }.mkString
    head + steps +
      " SELECT qid, vec_id, mmr_rank, rel, mmr_score FROM a5 ORDER BY qid, mmr_rank"
  }

  val oracles: Map[String, String] = Map(
    "qs_mmr_rerank" -> mmrOracleSql,
    // certificates are stated true; the exact anchor (covariance trace)
    // is recomputed from the same DECIMAL-sum / integer-scaled per-dim
    // variances the Spark plan uses
    "qs_pca" ->
      ("WITH e AS (SELECT unnest(range(len(embedding))) AS dim, unnest(embedding) AS v " +
        "FROM embeddings), " +
        "b AS (SELECT dim, CAST(v AS DOUBLE) AS vd FROM e), " +
        "s AS (SELECT dim, SUM(CAST(vd AS DECIMAL(38,20))) AS sv, " +
        "SUM(CAST(vd * vd AS DECIMAL(38,20))) AS svv, COUNT(*) AS n FROM b GROUP BY dim), " +
        "c AS (SELECT CAST(ROUND((CAST(svv AS DOUBLE) / n - " +
        "(CAST(sv AS DOUBLE) / n) * (CAST(sv AS DOUBLE) / n)) * 1e9) AS BIGINT) AS vs FROM s), " +
        "t AS (SELECT ROUND(SUM(vs) / 1e9, 6) AS trace_r FROM c) " +
        "SELECT range AS component, true AS evr_monotone_ok, true AS orthonormal_ok, " +
        "true AS rayleigh_ok, true AS eigsum_matches_trace, true AS topk_mass_ok, " +
        "trace_r FROM range(8) CROSS JOIN t ORDER BY component"),
    // the removed set is exactly the planted clones: a clone and its
    // donor are identical vectors (cos 1.0 > 0.95; co-clustered under
    // any model), and no natural pair reaches the threshold (max ≈
    // 0.51) — so DuckDB mirrors the output without running k-means
    "qs_semantic_dedup" ->
      ("SELECT vec_id, NOT (vec_id % 17 = 5 AND " +
        "vec_id - 3 >= (SELECT MIN(vec_id) FROM embeddings)) AS kept " +
        "FROM embeddings ORDER BY vec_id"),
    // codes are BIT-identical cross-engine: float→double widening,
    // double division, and round-half-away are all deterministic IEEE
    // steps both engines implement identically; the error bound is
    // mathematical (|round(x)·s − x·s| ≤ s/2), stated as the certified
    // boolean while the Spark plan re-measures it
    "qs_int8_quant" ->
      ("WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale " +
        "FROM q), " +
        "c AS (SELECT vec_id, scale, " +
        "list_transform(e, x -> CAST(CASE WHEN scale = 0 THEN 0 " +
        "ELSE round(x / scale, 0) END AS INT)) AS codes FROM s) " +
        "SELECT vec_id, ROUND(scale, 9) AS scale_r, " +
        "CAST(len(codes) AS BIGINT) AS n_dims, " +
        "md5(array_to_string(codes, ',')) AS codes_md5, " +
        "true AS err_within_bound FROM c ORDER BY vec_id"),
    "qs_hard_negatives" ->
      ("WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel " +
        "FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT qid, vec_id, " +
        "ROUND(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 6) AS cos " +
        "FROM q JOIN embeddings ON label <> qlabel), " +
        "ranked AS (SELECT qid, vec_id, cos, " +
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM scored) " +
        "SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 5 ORDER BY qid, rn"),
    // the self-certification contract: every query's ANN recall clears
    // the floor — the oracle states it, the Spark plan measures it
    "qs_ann_lsh" ->
      ("SELECT vec_id AS qid, CAST(10 AS BIGINT) AS k, " +
        "true AS recall_ge_certified " +
        "FROM embeddings WHERE vec_id < 5 ORDER BY qid"),
    // both retriever legs mirrored exactly (the qt_bm25 and
    // qs_cosine_topk shapes), then the same integer-rank 1/(60+rn)
    // fusion, rounded and ranked identically
    "qs_hybrid_rrf" ->
      ("WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents), " +
        "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT doc_id, " +
        "SUM(CASE WHEN token = 'join' THEN 1 ELSE 0 END) AS tf0, " +
        "SUM(CASE WHEN token = 'vector' THEN 1 ELSE 0 END) AS tf1, " +
        "SUM(CASE WHEN token = 'scan' THEN 1 ELSE 0 END) AS tf2 " +
        "FROM tok WHERE token IN ('join', 'vector', 'scan') GROUP BY doc_id), " +
        "st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs, " +
        "(SELECT SUM(dl) FROM dl) AS sum_dl, " +
        "(SELECT COUNT(DISTINCT doc_id) FROM tok WHERE token = 'join') AS df0, " +
        "(SELECT COUNT(DISTINCT doc_id) FROM tok WHERE token = 'vector') AS df1, " +
        "(SELECT COUNT(DISTINCT doc_id) FROM tok WHERE token = 'scan') AS df2), " +
        "sc AS (SELECT doc_id, " +
        "CASE WHEN tf0 > 0 THEN ln(((CAST(n_docs - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END + " +
        "CASE WHEN tf1 > 0 THEN ln(((CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END + " +
        "CASE WHEN tf2 > 0 THEN ln(((CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END AS score " +
        "FROM tf JOIN dl USING (doc_id) CROSS JOIN st), " +
        "lex AS (SELECT doc_id, rn_lex FROM (SELECT doc_id, " +
        "ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS rn_lex FROM sc) " +
        "WHERE rn_lex <= 20), " +
        "qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
        "cosd AS (SELECT vec_id AS doc_id, " +
        "ROUND(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 6) AS cos " +
        "FROM qv CROSS JOIN embeddings), " +
        "sem AS (SELECT doc_id, rn_sem FROM (SELECT doc_id, " +
        "ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rn_sem FROM cosd) " +
        "WHERE rn_sem <= 20), " +
        "f AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, rn_lex, rn_sem, " +
        "ROUND(COALESCE(1.0 / (60 + rn_lex), 0.0) + COALESCE(1.0 / (60 + rn_sem), 0.0), 6) AS rrf " +
        "FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id), " +
        "r AS (SELECT doc_id, rn_lex, rn_sem, rrf, " +
        "ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM f) " +
        "SELECT doc_id, rn_lex, rn_sem, rrf, rank FROM r WHERE rank <= 10 ORDER BY rank"),
    // same self-certification contract for the PQ index layout: the
    // Spark plan measures recall vs the exact top-10, the oracle states
    // the floor every query must clear
    "qs_pq_recall" ->
      ("SELECT vec_id AS qid, CAST(10 AS BIGINT) AS k, " +
        "true AS recall_ge_certified " +
        "FROM embeddings WHERE vec_id < 5 ORDER BY qid"),
    // and for the composed IVF-PQ layout
    "qs_ivfpq_recall" ->
      ("SELECT vec_id AS qid, CAST(10 AS BIGINT) AS k, " +
        "true AS recall_ge_certified " +
        "FROM embeddings WHERE vec_id < 5 ORDER BY qid"),
    "qs_centroid" ->
      ("WITH e AS (SELECT label, unnest(range(len(embedding))) AS dim, " +
        "unnest(embedding) AS v FROM embeddings) " +
        "SELECT label, dim, " +
        "ROUND(CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS c, " +
        "COUNT(*) AS n FROM e GROUP BY label, dim ORDER BY label, dim"),
    "qs_cosine_topk" ->
      ("WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5), " +
        "scored AS (SELECT qid, vec_id, " +
        "ROUND(list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 6) AS cos " +
        "FROM q CROSS JOIN embeddings), " +
        "ranked AS (SELECT qid, vec_id, cos, " +
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM scored) " +
        "SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 10 ORDER BY qid, rn"),
    // all-pairs in the oracle engine (fine at sf0.01); the Spark side
    // reaches the same set through LSH candidates + exact verify —
    // deterministic hashes, so equality locally certifies equality on
    // the driver's identical data
    "qs_embed_neardup" ->
      ("WITH corpus AS (SELECT vec_id, embedding FROM embeddings " +
        "UNION ALL SELECT vec_id + 10000000, " +
        "list_transform(embedding, x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) " +
        "FROM embeddings WHERE vec_id < 20) " +
        "SELECT a.vec_id AS da, b.vec_id AS db, " +
        "ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
        "CAST(b.embedding AS DOUBLE[])), 6) AS cos " +
        "FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id " +
        "WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), " +
        "CAST(b.embedding AS DOUBLE[])), 6) >= 0.9 ORDER BY da, db"))
}
