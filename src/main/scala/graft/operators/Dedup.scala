package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the first pillar
  * of the LLM-training-pipeline surface (exact, n-gram Jaccard, MinHash
  * LSH, SimHash).
  *
  * Scale discipline (the whole point of these shapes at 100 TB):
  *  - NEVER all-pairs. Candidate generation is always a join on a small
  *    key (shared shingle, LSH band bucket, SimHash chunk) so the shuffle
  *    carries (doc, key) rows, not doc×doc pairs.
  *  - Per-row fingerprint math (shingling, minhash, simhash) happens in
  *    expressions before any shuffle — map-side, codegen where it matters
  *    (`simhash64` is a native Catalyst expression).
  *  - The one skew hazard is a shingle shared by millions of docs; the
  *    `maxDocFreq` knob drops such stop-shingles (standard practice — they
  *    carry no signal) and bounds the worst key's fan-out.
  */
object Dedup {
  private val T = Tables

  /** Distinct n-token shingles of `text` via the native `word_shingles`
    * expression (one split, one pass, codegen — the HOF composition
    * re-splits the text per shingle; see [[graft.functions.WordShingles]]). */
  private def withShingles(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    docs.withColumn("sh", expr(s"array_distinct(word_shingles(text, $n))"))
  }

  /** Exact group-dedup with keeper selection: one aggregate, keeper = min
    * id per key group. (vs `dropDuplicates`, which keeps an arbitrary row
    * — fine for filtering, useless when you must report what was dropped.)
    */
  def exactDedup(docs: DataFrame, keys: Seq[String]): DataFrame =
    docs.groupBy(keys.map(col): _*)
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("members"))

  /** Exact n-gram Jaccard similarity pairs via a shingle inverted index:
    * explode shingles → self-join on the shingle → count shared per pair →
    * J = |∩| / (|A|+|B|-|∩|). Exact (not approximate) but still no
    * all-pairs: only doc pairs sharing ≥1 surviving shingle meet.
    * `maxDocFreq` > 0 drops shingles appearing in more docs than that.
    */
  def ngramJaccardPairs(docs: DataFrame, minJ: Double, n: Int = 3,
                        maxDocFreq: Long = 0L): DataFrame =
    ngramJaccardPairsManaged(docs, minJ, n, maxDocFreq)._1

  /** [[ngramJaccardPairs]] plus a release handle: the second element
    * unpersists the internally shared shingle stream (safe to call after
    * the returned DataFrame has been materialized — results already
    * computed are unaffected; later re-use just recomputes). Long-lived
    * sessions sweeping many distinct corpora should call it (or use the
    * loan-pattern [[withNgramJaccardPairs]]) so CacheManager entries
    * don't accumulate until a global `clearCache()`. */
  def ngramJaccardPairsManaged(docs: DataFrame, minJ: Double, n: Int = 3,
                               maxDocFreq: Long = 0L): (DataFrame, () => Unit) = {
    val sh = withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    // The cap is applied as a broadcast LEFT ANTI join against the DROP
    // list (shingles with doc-frequency > cap), not an inner join against
    // the KEEP list: the keep list is nearly all shingles (billions at
    // 100 TB — unbroadcastable, and joining it shuffles the whole
    // exploded-shingle stream once per consumer; measured 9 s → 55 s at
    // sf0.1), while the drop list is BY DEFINITION tiny — only the
    // ubiquitous stop-shingles — so the filter stays map-side: deriving
    // `filtered` is a single exchange-free pass over the scan (which is
    // what makes the one-shot materialization below cheap to produce).
    // Lifetime: callers that materialize once and move on should release
    // via the returned handle; the bare ngramJaccardPairs keeps the
    // round-4 behavior (entry lives until unpersist/clearCache, re-use
    // keyed by canonicalized plan).
    val filtered0 =
      if (maxDocFreq > 0) {
        val drop = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("s")
        sh.join(broadcast(drop), Seq("s"), "left_anti")
      } else sh
    // materialize the filtered exploded-shingle stream ONCE for its three
    // consumers (sizes + both self-join sides): each otherwise re-derives
    // the scan→split→explode→anti-join chain, including the doc-frequency
    // aggregate behind the drop list. Neutral at sf0.1, measured 1.9×
    // (21.5 s → 11.5 s) on the 10× scale smoke. persist, NOT a lineage
    // cut: reuse is the goal here (unlike dupClusters' per-round plan
    // growth), it stays lazy at construction, and the intact lineage
    // means an executor loss recomputes instead of failing. Lifetime:
    // the CacheManager keys entries by canonicalized plan, so repeated
    // calls over the same input reuse one entry rather than piling up;
    // MEMORY_AND_DISK evicts memory blocks LRU under pressure. Long
    // sessions sweeping many distinct corpora should clearCache()
    // between them — entries are only freed by unpersist/clearCache.
    val filtered = filtered0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val out = pairs
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("j",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("j") >= minJ)
      .select("da", "db", "j")
      .orderBy("da", "db")
    // blocking: the loan contract is "entry released BEFORE the wrapper
    // returns" — the default async unpersist leaves a window where the
    // entry outlives the call (seen as a rare suite flake under load)
    (out, () => { filtered.unpersist(blocking = true); () })
  }

  /** Loan-pattern wrapper over [[ngramJaccardPairsManaged]]: `use` runs
    * while the shared shingle stream is cached; the cache entry is
    * released before this returns, even on failure. */
  def withNgramJaccardPairs[T](docs: DataFrame, minJ: Double, n: Int = 3,
                               maxDocFreq: Long = 0L)(use: DataFrame => T): T = {
    val (pairs, release) = ngramJaccardPairsManaged(docs, minJ, n, maxDocFreq)
    try use(pairs) finally release()
  }

  /** MinHash + LSH near-dup pairs: k=64 minhash signature per doc, banded
    * into b=16 bands of r=4 → docs agreeing on any band meet in a
    * band-bucket join; candidates are then verified with the exact
    * Jaccard. Band probability 1-(1-J^4)^16 ≈ 1 for J ≥ 0.8 — at the 0.5
    * verify threshold recall is ~0.64 for a pair at exactly 0.5 and
    * ≥ 0.9999 above 0.8 (tune r/b per corpus). Deterministic (xxhash64,
    * fixed seeds).
    *
    * The signature is computed RELATIONALLY — explode shingles, one row
    * per (doc, hash-index), `min(xxhash64(s, i))` aggregate, then a
    * band-hash aggregate — NOT as nested array lambdas. Nested HOFs here
    * are a trap: CollapseProject inlines the shingle array into the
    * 64-way transform and the band expression re-inlines the whole
    * signature 16×, exploding interpreted-eval work multiplicatively
    * (observed: minutes per 500 docs). The relational form is all
    * codegen'd aggregates with map-side combine and scales linearly.
    */
  def minhashPairs(docs: DataFrame, minJ: Double, n: Int = 3): DataFrame = {
    val k = 64; val r = 4
    // whole signature per doc at the scan via the native expression — no
    // shingle explode, no shuffle until the band join (5.2 s -> sub-second
    // signature phase at sf0.1; see minhashSignatureViaAgg for the
    // aggregator-based reference formulation).
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val sig = docs.withColumn("sig", expr(s"minhash_signature(text, $n, $k)"))
    val nBands = k / r
    val buckets = sig.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, ${nBands - 1}), " +
        s"j -> xxhash64(slice(sig, j * $r + 1, $r)))"))
        .as(Seq("band_idx", "bucket")))
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // Verify candidates with the exact Jaccard over shingle sets.
    val shSets = withShingles(docs, n).select(col("doc_id"), col("sh"))
    cands
      .join(shSets.withColumnRenamed("doc_id", "da").withColumnRenamed("sh", "sha"), "da")
      .join(shSets.withColumnRenamed("doc_id", "db").withColumnRenamed("sh", "shb"), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("j", round(col("inter").cast("double")
        / (size(col("sha")) + size(col("shb")) - col("inter")), 6))
      .filter(col("j") >= minJ)
      .select("da", "db", "j")
      .orderBy("da", "db")
  }

  /** Aggregator-based MinHash signature — the relational reference
    * formulation (explode shingles → k seeded hashes per shingle →
    * element-wise-min typed Aggregator, partial+final). Shuffles k longs
    * per shingle where [[minhashPairs]]'s native expression ships k longs
    * per DOC, but it composes with arbitrary upstream shapes (pre-joined
    * inputs, non-text shingles) and pins the expression's hash math:
    * DedupSpec asserts both paths emit identical signatures.
    */
  def minhashSignatureViaAgg(docs: DataFrame, n: Int = 3, k: Int = 64): DataFrame = {
    val sh = withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    sh
      .withColumn("hs",
        expr(s"transform(sequence(bigint(0), bigint(${k - 1})), i -> xxhash64(s, i))"))
      .groupBy("doc_id")
      .agg(graft.functions.VectorAggs.elementwiseMin(col("hs")).as("sig"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprint per doc via the native
    * `simhash64` expression, banded into 4 16-bit chunks → docs agreeing
    * on any chunk meet; candidates verified by Hamming distance
    * (pigeonhole: distance ≤ 3 is guaranteed to share a chunk; beyond
    * that recall decays — widen chunks or add rotations for higher radii).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val fp = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sim", expr("simhash64(toks)"))
    val chunks = fp.select(col("doc_id"), col("sim"),
      posexplode(expr("transform(sequence(0, 3), c -> shiftright(sim, c * 16) & 65535)"))
        .as(Seq("chunk_idx", "chunk")))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.sim ^ b.sim)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("da", "db")
  }

  /** Truncate lineage between label-propagation rounds. Iterative
    * DataFrame algorithms MUST cut lineage every round or the plan (and
    * recomputation cost) grows exponentially. Two modes:
    *  - a reliable checkpoint dir is configured
    *    (`spark.sparkContext.setCheckpointDir(...)`) → `df.checkpoint`:
    *    blocks go to the fault-tolerant store (HDFS/S3 on a cluster), so
    *    an executor loss mid-iteration recovers from the checkpoint
    *    instead of aborting the job — the right mode on a real cluster.
    *    The Dataset is cached around the checkpoint: `RDD.checkpoint`'s
    *    write job otherwise RECOMPUTES the whole plan from scratch (the
    *    documented RDD behavior), doubling every round's work. With the
    *    cache, the write job reads blocks; cost per cut is one compute
    *    job + one cache-read write job.
    *  - no checkpoint dir (local runs, tests, bench) → `localCheckpoint`:
    *    blocks pinned to executor storage, no FS round-trip — fastest
    *    (`eager = false` lets the caller fold the materialization into
    *    its next action: one job per round), but an executor loss is
    *    unrecoverable (lineage is truncated).
    */
  private[operators] def cutLineage(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // eager regardless of the flag: the checkpoint must be written
      // while the cache is alive, and unpersist must come after it
      val out = cached.checkpoint(true)
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint(eager)

  /** Duplicate CLUSTERS from near-dup pairs: connected components by
    * iterative min-label propagation. Pairs only say "a ~ b"; choosing a
    * canonical doc per duplicate group needs the transitive closure
    * (a~b, b~c ⇒ {a,b,c} one group).
    *
    * Each iteration joins every node's current label against its
    * neighbors' and keeps the minimum, then follows the winning label's
    * OWN label one hop (pointer doubling / path halving, the classic
    * PRAM shortcut also used by Kiveris et al.'s star algorithms): a
    * label chain of length d collapses in O(log d) rounds instead of
    * O(d), so a pathological CHAIN of near-dups — common in boilerplate
    * corpora where doc i ~ doc i+1 — converges inside the default
    * `maxIter` (10 rounds cover diameter ≳ 2^9; DedupSpec pins a
    * 50-node path). Near-dup graphs are overwhelmingly tiny cliques
    * (diameter ≤ 2-3) where round 2 already fixpoints; convergence is
    * checked, not assumed. Labels and edges are ids only — nothing wide
    * shuffles; the shortcut is one extra id↔id self-join per round. The
    * shortcut preserves the invariant that a node's label is the id of
    * some node in its component, so the fixpoint argument (all labels
    * equal the component min) is unchanged. (The classic alternative —
    * collect edges to the driver for union-find — caps at driver
    * memory; this stays distributed.) Lineage is cut per round via
    * [[cutLineage]]: reliable checkpoints when a checkpoint dir is set,
    * local otherwise.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // materialize the edge list ONCE: it is tiny (near-dup pairs, not
    // docs) and every iteration joins against it — without this the whole
    // upstream pair pipeline re-executes per round (measured 15.7 s vs
    // ~4 s at sf0.1 for 5 rounds)
    val edges = cutLineage(pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
      .distinct(), eager = true)
    // no cut for the seed labels: they are one distinct over the already
    // materialized edge blocks, so round 1's two consumers recompute a
    // trivial aggregate instead of paying an extra eager checkpoint job
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over own label and all neighbors' labels
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nl"), "dst")
        .groupBy(col("src").as("id")).agg(min("nl").as("minN"))
      // carry the previous label alongside the update so convergence is
      // read off the SAME job that materializes the checkpoint: the lazy
      // cut is computed by the aggregate below — one Spark job per round
      // where a separate next-vs-labels diff join + limit(1).count()
      // probe cost an extra job and an extra shuffle every iteration
      // materialized (lazy cut) because the pointer-doubling self-join
      // below consumes it on BOTH sides: without the cut the labels ⋈
      // neighborLabels propagation join runs twice per round
      val propagated = cutLineage(labels.join(neighborLabels, "id")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), col("minN")).as("label")), eager = false)
      // pointer doubling: jump to the label's own (post-propagation)
      // label. Left join: a component's min node is its own label and
      // must survive the hop; label values are always member ids, so
      // the probe side is the same labeling.
      val ptr = propagated.select(col("id").as("p_id"), col("label").as("p_label"))
      val next = cutLineage(propagated
        .join(ptr, col("label") === col("p_id"), "left")
        .select(col("id"), col("prev"),
          least(col("label"), coalesce(col("p_label"), col("label"))).as("label")),
        eager = false)
      val changed = next
        .agg(coalesce(max(col("label") =!= col("prev")), lit(false)).as("c"))
        .head().getBoolean(0)
      labels = next.select("id", "label")
      converged = !changed
      iter += 1
    }
    // a partial labeling is NOT components — fail loudly rather than
    // hand back something that looks right on small graphs
    if (!converged) throw new IllegalStateException(
      s"dupClusters did not converge in $maxIter iterations - " +
        "the dup graph has a longer path than expected; raise maxIter")
    labels.withColumnRenamed("label", "cluster")
  }

  /** Substring-level exact dedup — the duplicated-ngram removal of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" (public knowledge): emit, per document, the maximal token
    * spans every token of which lies inside some k-token window that
    * also appears in ≥ `minDocs` DISTINCT documents. Doc-level dedup
    * (exact or near) cannot see these: two otherwise-unrelated documents
    * quoting the same boilerplate paragraph both survive; span-level
    * dedup names the paragraph and its exact token range in each doc.
    *
    * The paper's formulation is a corpus-wide suffix array — inherently
    * one machine's memory. The Spark-first re-expression works on fixed
    * k-token windows: (1) shingle each doc at the scan (native codegen'd
    * `word_shingles`), keying windows by md5 so shuffle keys are 32
    * bytes, not k tokens; (2) one aggregation finds the windows present
    * in ≥ minDocs distinct docs; (3) a semi-join marks each doc's
    * duplicated window starts; (4) a per-doc gaps-and-islands pass
    * unions overlapping/adjacent covered intervals [p, p+k-1] into
    * maximal spans (window starts p, q merge iff q-p ≤ k). Never
    * all-pairs, nothing on the driver; the cost is two shuffles of
    * (doc, window) rows plus one window function partitioned by doc —
    * every stage partitions by a key whose groups are bounded (a window
    * hash's doc list is only ever counted, never collected).
    *
    * Docs shorter than k tokens carry no k-window and are excluded
    * (`word_shingles` pads them to one whole-text shingle for the
    * near-dup operators; a whole-short-doc duplicate is doc-level
    * dedup's job, and the pad would mis-state span_end here).
    */
  def duplicatedSpans(docs: DataFrame, k: Int, minDocs: Int = 2,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"window length must be positive: $k")
    require(minDocs >= 2, s"minDocs < 2 would flag every window: $minDocs")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val windows = docs
      .filter(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc_id"),
        posexplode(call_function("word_shingles", col(textCol), lit(k)))
          .as(Seq("pos", "shingle")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("shingle")).as("h"))
    val dupWindows = windows.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val hits = windows.join(dupWindows, Seq("h"), "left_semi")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1L).otherwise(0L))
      .withColumn("sid", sum("ns").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "sid")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(k - 1)).as("span_end"),
        (max("pos") + lit(k) - min("pos")).as("span_tokens"))
      .select("doc_id", "span_start", "span_end", "span_tokens")
  }

  /** The ACTIONABLE half of [[duplicatedSpans]]: remove every duplicated
    * span from every document and return the cleaned text (plus how many
    * tokens each doc kept/lost). This is the step Lee et al. 2022
    * actually apply to the training corpus — finding spans is reporting;
    * scrubbing them changes the data.
    *
    * Shape: the span frame (tiny — maximal merged spans per doc) is
    * collected per doc into a struct list and joined back; token removal
    * is then a scan-side higher-order `filter` with the position index
    * tested against the doc's own span list. No second shuffle beyond
    * the span computation itself; spans per doc are disjoint by
    * construction (maximal merge), so a token matches at most one. Docs
    * without spans (or shorter than k) pass through untouched. */
  def scrubDuplicatedSpans(docs: DataFrame, k: Int, minDocs: Int = 2,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = duplicatedSpans(docs, k, minDocs, idCol, textCol)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .join(spans, Seq("doc_id"), "left")
      // null span list (untouched doc): `sp IS NULL OR` keeps every token
      .withColumn("clean", expr(
        "filter(toks, (t, i) -> sp IS NULL OR " +
          "NOT exists(sp, s -> i >= s.span_start AND i <= s.span_end))"))
      .select(col("doc_id"),
        size(col("clean")).cast("long").as("kept"),
        (size(col("toks")) - size(col("clean"))).cast("long").as("removed"),
        md5(array_join(col("clean"), " ")).as("fp"))
  }

  /** Asymmetric shingle containment C(A in B) = |S(A)∩S(B)| / |S(A)|:
    * flags documents mostly CONTAINED in another — quoted excerpts,
    * boilerplate-wrapped copies, page supersets — which symmetric
    * Jaccard structurally misses (a long container B inflates the union
    * and dilutes J; it never dilutes C). Standard resemblance-vs-
    * containment distinction from Broder 1997 ("On the resemblance and
    * containment of documents" — public knowledge).
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] — explode
    * shingles, self-join on the shingle, count shared per pair — so
    * candidates exist only for pairs sharing ≥1 surviving shingle,
    * never all-pairs, and `maxDocFreq` bounds the worst shingle's join
    * fan-out. Emits BOTH orientations of a qualifying pair (containment
    * is directional): `(inner, outer, c)` with `c = |∩| / |S(inner)|`.
    */
  def containmentPairs(docs: DataFrame, minC: Double, n: Int = 3,
                       maxDocFreq: Long = 0L): DataFrame = {
    val sh = withShingles(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val filtered =
      if (maxDocFreq > 0) {
        val drop = sh.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("s")
        sh.join(broadcast(drop), Seq("s"), "left_anti")
      } else sh
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // one undirected join (a < b), fanned to both orientations afterwards
    // — half the pair-join shuffle of joining twice
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val both = pairs.select(col("da").as("doc_in"), col("db").as("doc_out"), col("inter"))
      .unionAll(pairs.select(col("db").as("doc_in"), col("da").as("doc_out"), col("inter")))
    both
      .join(sizes.withColumnRenamed("doc_id", "doc_in").withColumnRenamed("n", "ni"), "doc_in")
      .withColumn("c", round(col("inter").cast("double") / col("ni"), 6))
      .filter(col("c") >= minC)
      .select("doc_in", "doc_out", "c")
  }

  /** All id pairs whose `strCol` values are within Levenshtein distance
    * `k`, exactly, via deletion-neighborhood blocking (the FastSS scheme
    * of Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries"
    * — public knowledge): if lev(a,b) ≤ k then deleting ≤ k characters
    * from each side reaches a common string, so an equi-join on the
    * deletion variants is a LOSSLESS candidate superset, and the exact
    * `levenshtein` residual filter makes the output exact.
    *
    * 100 TB shape: variants are generated map-side by higher-order
    * functions (no UDF, stays in codegen), the shuffle key is the
    * variant string, and a variant is only ever shared by strings
    * already within distance 2k of each other — so per-key fan-out is
    * bounded by the size of a true near-duplicate cluster, never the
    * corpus. The naive alternative is the O(n²) cross join the DuckDB
    * oracle runs at sf0.01 (and could not run at scale — which is the
    * point). Neighborhood size is O(len^k) per row; k is capped at 2.
    */
  def fuzzyJoinLev(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 2,
      s"fuzzyJoinLev: supported k is 1..2 (deletion neighborhood is O(len^k) per row), got $k")
    // one deletion applied to every string of `arr`; empty strings have
    // no deletions (and sequence(0,-1) would count DOWN, so guard them)
    def delOnce(arr: String): String =
      s"flatten(transform($arr, x -> if(length(x) = 0, " +
        "cast(array() as array<string>), " +
        "transform(sequence(0, length(x) - 1), " +
        "i -> concat(substring(x, 1, i), substring(x, i + 2))))))"
    val levels = Iterator.iterate("array(s)")(delOnce).take(k + 1).toSeq
    val neighborhood = s"array_distinct(concat(${levels.mkString(", ")}))"
    // the variant text itself is never needed downstream — only equality
    // of variants matters — so the join key is its 8-byte xxhash64, not
    // the string: roughly half the shuffle bytes on real names. LOSSLESS:
    // a hash collision can only ADD a candidate pair, and every candidate
    // passes the exact levenshtein filter below (the same argument that
    // makes deletion blocking itself a superset).
    // fan the projected (id, s) frame out before the variant explode:
    // the neighborhood generation is the expensive map stage, and a
    // sub-split-size input otherwise runs it on one core (Tables.fanOut
    // widens only — at-scale inputs pass through untouched)
    val v = Tables.fanOut(df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s")))
      .select(col("id"), col("s"), explode(expr(neighborhood)).as("vs"))
      .select(col("id"), col("s"), xxhash64(col("vs")).as("v"))
    val candidates = v.toDF("id_a", "s_a", "v")
      .join(v.toDF("id_b", "s_b", "v"), Seq("v"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("s_a")) - length(col("s_b"))) <= k)
      // distinct BEFORE the levenshtein: a pair sharing m variants
      // arrives m times; dedup on ids first so the O(len²) distance
      // runs once per pair
      .select("id_a", "id_b", "s_a", "s_b").distinct()
    candidates
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "dist")
  }

  // ---- query-pack entries over the documents table ----

  /** The documents scan projected to the two columns the fingerprint
    * operators read, fanned out to session parallelism (Tables.fanOut):
    * at bench SF the table is one sub-split-size file, so the
    * shingle/variant explode — the expensive map stage feeding every
    * pair join — ran on one core. Projection FIRST, so the round-robin
    * exchange carries (id, text), nothing wider (guide §2.3). */
  private def fannedDocs(spark: SparkSession, d: String): DataFrame =
    Tables.fanOut(T.documents(spark, d).select("doc_id", "text"))

  def qdExactDedup(spark: SparkSession, d: String): DataFrame =
    exactDedup(T.documents(spark, d), Seq("lang", "source"))
      .orderBy("lang", "source")

  /** Stop-shingle cap for the declared ngram entries: a shingle present in
    * more docs than this is dropped before the inverted-index join. At
    * corpus scale a ubiquitous shingle ("of the x") otherwise fans out
    * quadratically on one shuffle key; the cap bounds any key's join
    * fan-out to maxDocFreq² rows. Mirrored exactly in the DuckDB oracle
    * (a HAVING on the shingle doc-frequency CTE), so the check stays
    * hash-exact with the cap active. */
  val NgramMaxDocFreq = 50L

  def qdNgramJaccard(spark: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(fannedDocs(spark, d), minJ = 0.1,
      maxDocFreq = NgramMaxDocFreq)

  def qdMinhashLsh(spark: SparkSession, d: String): DataFrame =
    minhashPairs(fannedDocs(spark, d), minJ = 0.8)

  /** Containment at C ≥ 0.2 over trigram shingles, same stop-shingle cap
    * as the Jaccard entry so the two rows describe the same filtered
    * shingle universe. */
  def qdContainment(spark: SparkSession, d: String): DataFrame =
    containmentPairs(fannedDocs(spark, d), minC = 0.2,
      maxDocFreq = NgramMaxDocFreq)
      .orderBy("doc_in", "doc_out")

  /** Record linkage over customer names at edit distance ≤ 1: TPC-H
    * names differ in digit positions, so single-substitution neighbors
    * abound — a realistic entity-resolution fixture. */
  def qdFuzzyJoin(spark: SparkSession, d: String): DataFrame =
    fuzzyJoinLev(T.customer(spark, d), "c_custkey", "c_name", 1)
      .orderBy("id_a", "id_b")

  /** maxHamming = 3 makes the search EXACT: with 4 16-bit chunks, any
    * pair within Hamming distance 3 shares at least one chunk
    * (pigeonhole), so banding has 100% recall at this radius.
    *
    * SELF-CERTIFYING row: the simhash pair SET depends on xxhash64 (no
    * DuckDB twin), so the declared entry plants identical-text pairs
    * deterministically (doc_id ≡ 4 mod 11 takes the text of doc_id−3 —
    * the corpus has no natural exact dups; same device as
    * qt_contamination) and emits the identical-pair count (the oracle
    * recomputes it closed-form from the same injection) plus the count
    * found at hamming 0 and a completeness boolean. Identical text ⇒
    * identical simhash ⇒ distance 0 ⇒ banding MUST surface the pair, so
    * the hash check pins the native `simhash64` expression, the chunk
    * banding join, and `bit_count` end to end — a regression in any of
    * them breaks equality. DedupSpec carries the radius-3 pigeonhole
    * claims on the raw pair list ([[simhashPairs]]). */
  def qdSimhash(spark: SparkSession, d: String): DataFrame = {
    val base = T.documents(spark, d).select("doc_id", "text")
    val donors = base.select(col("doc_id").as("donor_id"), col("text").as("donor_text"))
    val docs = base
      .withColumn("donor_id", when(col("doc_id") % 11 === 4, col("doc_id") - 3))
      .join(donors, Seq("donor_id"), "left")
      .withColumn("text", coalesce(col("donor_text"), col("text")))
      .select("doc_id", "text")
    val keyed = docs.select(col("doc_id"), md5(col("text")).as("k"))
    val idPairs = keyed.as("a")
      .join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val atZero = simhashPairs(docs, maxHamming = 3)
      .filter(col("hamming") === 0)
      .select("da", "db").withColumn("_f", lit(true))
    idPairs.join(atZero, Seq("da", "db"), "left")
      .agg(count(lit(1)).as("identical_pairs"),
        sum(when(col("_f"), 1L).otherwise(0L)).as("found_at_zero"))
      .select(col("identical_pairs"), col("found_at_zero"),
        (col("identical_pairs") === col("found_at_zero")).as("recall_at_zero_complete"))
  }

  def qdDupClusters(spark: SparkSession, d: String): DataFrame =
    // NOT fanned out: the label-propagation rounds re-execute their
    // input plan per iteration, so the extra exchange multiplies
    // (measured 4.1 s -> 4.9-6.1 s at sf0.1); the pairs pipeline's own
    // shuffles already parallelize the heavy legs
    dupClusters(ngramJaccardPairs(T.documents(spark, d).select("doc_id", "text"),
      minJ = 0.5, maxDocFreq = NgramMaxDocFreq))
      .orderBy("id")

  /** Window length for the declared substring-dedup entry. 8 tokens
    * matches qt_contamination's n-gram length; the corpus's planted
    * near-duplicate docs share long exact runs, so the entry has real
    * spans to find (47 at sf0.01) without injection. */
  val SubstringDupK = 8

  def qtSubstringDup(spark: SparkSession, d: String): DataFrame =
    duplicatedSpans(T.documents(spark, d), k = SubstringDupK)
      .orderBy("doc_id", "span_start")

  /** The scrub applied corpus-wide: per doc, tokens kept/removed and an
    * md5 fingerprint of the CLEANED text — the fingerprint makes the
    * oracle comparison byte-exact on the reassembled string, not just
    * on counts. */
  def qtSubstringScrub(spark: SparkSession, d: String): DataFrame =
    scrubDuplicatedSpans(T.documents(spark, d), k = SubstringDupK)
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qd_exact_dedup" -> qdExactDedup _,
    "qd_ngram_jaccard" -> qdNgramJaccard _,
    "qd_minhash_lsh" -> qdMinhashLsh _,
    "qd_simhash" -> qdSimhash _,
    "qd_dup_clusters" -> qdDupClusters _,
    "qd_containment" -> qdContainment _,
    "qd_fuzzy_join" -> qdFuzzyJoin _,
    "qt_substring_dup" -> qtSubstringDup _,
    "qt_substring_scrub" -> qtSubstringScrub _)

  /** DuckDB twin of the shingle inverted index (list comprehension form).
    * `maxDocFreq` > 0 mirrors the Spark side's stop-shingle cap: the `fs`
    * CTE keeps only shingles whose doc-frequency is within the cap, and
    * sizes/pairs are computed over the filtered set — exactly like
    * [[ngramJaccardPairs]], so the comparison stays hash-exact.
    *
    * `qd_minhash_lsh` shares the exact-Jaccard oracle at the J≥0.8 verify
    * threshold, squarely in the high-recall band regime: per-pair band
    * recall is 1-(1-J^4)^16 ≥ 0.9998 at J=0.8 and ≥ 1-4e-8 at J≥0.9
    * (where every true pair of this corpus actually sits), and the hash
    * seeds are fixed, so the result equals the exact answer
    * deterministically — not by corpus accident, as the previous 0.5
    * threshold relied on. `qd_simhash` carries the planted-pair
    * recall-at-0 certification (see [[qdSimhash]]); DedupSpec covers
    * the radius-3 pair list.
    */
  private def shingleCtes(maxDocFreq: Long): String =
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
      "range(1, greatest(len(string_split(text, ' ')) - 1, 2)), " +
      "i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS s FROM documents), " +
    (if (maxDocFreq > 0)
      s"keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $maxDocFreq), " +
        "fs AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)), "
     else "fs AS (SELECT doc_id, s FROM sh), ") +
    "sizes AS (SELECT doc_id, COUNT(*) AS n FROM fs GROUP BY doc_id), " +
    "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter " +
      "FROM fs a JOIN fs b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)"

  /** DuckDB twin of [[containmentPairs]]: the same filtered shingle
    * universe as the Jaccard oracle, both orientations unioned, the
    * denominator is the INNER doc's shingle count, and the ≥-filter is
    * applied to the ROUNDED value exactly like the Spark side. */
  private def containmentOracle(minC: Double, maxDocFreq: Long = 0L): String =
    s"WITH ${shingleCtes(maxDocFreq)}, " +
    "bo AS (SELECT da AS doc_in, db AS doc_out, inter FROM pairs " +
      "UNION ALL SELECT db, da, inter FROM pairs) " +
    "SELECT doc_in, doc_out, ROUND(CAST(inter AS DOUBLE) / si.n, 6) AS c " +
    "FROM bo JOIN sizes si ON doc_in = si.doc_id " +
    s"WHERE ROUND(CAST(inter AS DOUBLE) / si.n, 6) >= $minC " +
    "ORDER BY doc_in, doc_out"

  /** Brute-force twin of [[fuzzyJoinLev]]: the O(n²) cross join with an
    * exact levenshtein — feasible at sf0.01 (1500² name pairs), which is
    * exactly the plan shape the deletion-neighborhood join exists to
    * avoid at scale. The length prefilter mirrors a necessary condition
    * of lev ≤ k (never excludes a true pair), it only speeds DuckDB up. */
  private def fuzzyJoinOracle(k: Int): String =
    "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
    "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
    "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey " +
    s"AND abs(length(a.c_name) - length(b.c_name)) <= $k " +
    s"WHERE levenshtein(a.c_name, b.c_name) <= $k " +
    "ORDER BY id_a, id_b"

  private def jaccardOracle(minJ: Double, maxDocFreq: Long = 0L): String =
    s"WITH ${shingleCtes(maxDocFreq)} " +
    "SELECT da, db, ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS j " +
    "FROM pairs JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id " +
    // filter on the ROUNDED value, exactly like the Spark side, so the
    // boundary comparison is bit-identical across engines
    s"WHERE ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) >= $minJ " +
    "ORDER BY da, db"

  /** Connected components as a recursive CTE over the same pair set —
    * `reach` enumerates every node's reachable set (UNION dedup bounds
    * it), the component label is the minimum. */
  private def clustersOracle(minJ: Double, maxDocFreq: Long = 0L): String =
    s"WITH RECURSIVE ${shingleCtes(maxDocFreq)}, " +
    "jp AS (SELECT da, db FROM pairs JOIN sizes sa ON da = sa.doc_id " +
      "JOIN sizes sb ON db = sb.doc_id " +
      s"WHERE ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) >= $minJ), " +
    "edges AS (SELECT da AS src, db AS dst FROM jp UNION SELECT db, da FROM jp), " +
    "reach(id, r) AS (SELECT src, src FROM edges " +
      "UNION SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src) " +
    "SELECT id, MIN(r) AS cluster FROM reach GROUP BY id ORDER BY id"

  /** DuckDB twin of [[duplicatedSpans]]: the same k-token windows (list
    * slice + md5), the same ≥-minDocs distinct-doc filter, the same
    * gaps-and-islands merge — closed-form SQL, so the row is hash-exact,
    * not rows-only. `pos` is 0-based on both sides; DuckDB list slicing
    * is 1-based inclusive, hence `l[pos+1 : pos+k]`. */
  private def substringDupOracle(k: Int, minDocs: Int = 2): String =
    s"WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), " +
    s"s0 AS (SELECT doc_id, l, unnest(range(0, len(l) - ${k - 1}))::BIGINT AS pos " +
      s"FROM d WHERE len(l) >= $k), " +
    s"sh AS (SELECT doc_id, pos, md5(array_to_string(l[pos+1 : pos+$k], ' ')) AS h FROM s0), " +
    s"dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $minDocs), " +
    s"m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER w IS NULL " +
      s"OR pos - lag(pos) OVER w > $k THEN 1 ELSE 0 END AS ns " +
      "FROM sh WHERE h IN (SELECT h FROM dup) " +
      "WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), " +
    "s AS (SELECT doc_id, pos, SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m) " +
    s"SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${k - 1} AS span_end, " +
    s"MAX(pos) + $k - MIN(pos) AS span_tokens " +
    "FROM s GROUP BY doc_id, sid ORDER BY doc_id, span_start"

  /** DuckDB twin of [[scrubDuplicatedSpans]]: same span CTEs, then a
    * token-level left join against the (disjoint) spans and an ordered
    * string_agg of the uncovered tokens — md5 equality on the
    * reassembled text proves the removal is byte-exact, including the
    * fully-covered docs (md5 of the empty string). */
  private def substringScrubOracle(k: Int, minDocs: Int = 2): String =
    s"WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), " +
    s"s0 AS (SELECT doc_id, l, unnest(range(0, len(l) - ${k - 1}))::BIGINT AS pos " +
      s"FROM d WHERE len(l) >= $k), " +
    s"sh AS (SELECT doc_id, pos, md5(array_to_string(l[pos+1 : pos+$k], ' ')) AS h FROM s0), " +
    s"dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $minDocs), " +
    s"m AS (SELECT doc_id, pos, CASE WHEN lag(pos) OVER w IS NULL " +
      s"OR pos - lag(pos) OVER w > $k THEN 1 ELSE 0 END AS ns " +
      "FROM sh WHERE h IN (SELECT h FROM dup) " +
      "WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), " +
    "s AS (SELECT doc_id, pos, SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m), " +
    s"spans AS (SELECT doc_id, MIN(pos) AS a, MAX(pos) + ${k - 1} AS b " +
      "FROM s GROUP BY doc_id, sid), " +
    "tk AS (SELECT doc_id, unnest(l) AS tok, " +
      "generate_subscripts(l, 1)::BIGINT - 1 AS pos FROM d), " +
    "j AS (SELECT t.doc_id, t.tok, t.pos, sp.a FROM tk t LEFT JOIN spans sp " +
      "ON t.doc_id = sp.doc_id AND t.pos BETWEEN sp.a AND sp.b) " +
    "SELECT doc_id, COUNT(*) FILTER (WHERE a IS NULL) AS kept, " +
    "COUNT(*) FILTER (WHERE a IS NOT NULL) AS removed, " +
    "md5(COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE a IS NULL), '')) AS fp " +
    "FROM j GROUP BY doc_id ORDER BY doc_id"

  val oracles: Map[String, String] = Map(
    "qd_exact_dedup" ->
      ("SELECT lang, source, MIN(doc_id) AS keeper, COUNT(*) AS members " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),
    "qd_ngram_jaccard" -> jaccardOracle(0.1, NgramMaxDocFreq),
    "qd_minhash_lsh" -> jaccardOracle(0.8),
    "qd_dup_clusters" -> clustersOracle(0.5, NgramMaxDocFreq),
    "qd_containment" -> containmentOracle(0.2, NgramMaxDocFreq),
    "qd_fuzzy_join" -> fuzzyJoinOracle(1),
    "qt_substring_dup" -> substringDupOracle(SubstringDupK),
    "qt_substring_scrub" -> substringScrubOracle(SubstringDupK),
    // qd_simhash self-certification: the oracle recomputes the planted
    // identical-pair count from the same injection and asserts complete
    // recall at distance 0 (identical text ⇒ identical simhash)
    "qd_simhash" ->
      ("WITH base AS (SELECT doc_id, text FROM documents), " +
        "inj AS (SELECT b.doc_id, COALESCE(dn.text, b.text) AS text FROM base b " +
        "LEFT JOIN base dn ON dn.doc_id = " +
        "CASE WHEN b.doc_id % 11 = 4 THEN b.doc_id - 3 END), " +
        "k AS (SELECT doc_id, md5(text) AS k FROM inj), " +
        "p AS (SELECT a.doc_id AS da, b.doc_id AS db FROM k a " +
        "JOIN k b ON a.k = b.k AND a.doc_id < b.doc_id) " +
        "SELECT COUNT(*) AS identical_pairs, COUNT(*) AS found_at_zero, " +
        "true AS recall_at_zero_complete FROM p"))
}
