package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The two-batch incremental-ingest composite: the stored-summary family
  * ([[Sketches]]), the quarantine decode ([[Multimodal]]), exact dedup
  * and the deterministic split ([[TextAnalysis]]) wired END TO END, the
  * way a real crawl pipeline runs them — batch 1 is yesterday's ingest
  * (its clean keys become the stored seen-filter), batch 2 is today's,
  * probed against that filter before anything expensive touches it.
  *
  * Every stage is oracle-checked in isolation elsewhere (qm_quarantine,
  * qk_bloom_unseen, qd_exact_dedup, qt_split); `qp_ingest` pins their
  * COMPOSITION with one hash-exact row.
  *
  * The bloom step stays EXACT in composition by the standard two-tier
  * probe: a key the filter has never seen is DEFINITELY new (no false
  * negatives ⇒ the fast path is sound); a key the filter *might* have
  * seen goes to an exact anti-join against the stored batch-1 keys.
  * Union of the two tiers ≡ the plain exact anti-join — which is what
  * the DuckDB oracle computes — while the expensive join only ever
  * processes the might-seen sliver (FP-rate-bounded) instead of the
  * whole batch. That is both the 100 TB shape AND the reason a
  * closed-form oracle exists at all: false positives move rows between
  * tiers, never across the result boundary.
  */
object Ingest {
  private val T = Tables

  /** Deterministic duplicate injection (the corpus has no natural exact
    * text dups — same device as qt_contamination's planted overlaps):
    * every doc_id ≡ 9 (mod 15) doc takes the text of doc_id−2 — a
    * batch-1 resident, exercising the seen-filter drop — and every
    * doc_id ≡ 12 (mod 15) doc takes the text of doc_id−6 — a fellow
    * batch-2 resident, exercising the in-batch dedup. Mirrored verbatim
    * in the oracle, so the triples stay integer-exact cross-engine. */
  private def injectDuplicates(docs: DataFrame): DataFrame = {
    val donors = docs.select(col("doc_id").as("donor_id"), col("text").as("donor_text"))
    docs
      .withColumn("donor_id",
        when(col("doc_id") % 15 === 9, col("doc_id") - 2)
          .when(col("doc_id") % 15 === 12, col("doc_id") - 6))
      .join(donors, Seq("donor_id"), "left")
      .withColumn("text", coalesce(col("donor_text"), col("text")))
      .select("doc_id", "text")
  }

  /** QP-INGEST — the funnel, one row per stage:
    * quarantine (real PPM decode of the per-doc payload; corrupt rows
    * counted, never silently lost) → batch-1 clean keys become the
    * stored seen-filter → batch-2 probes it (two-tier, see object doc)
    * → exact dedup of the surviving new docs (min-id keeper) →
    * deterministic content-hash split. Batch membership is doc_id % 3
    * (2/3 history, 1/3 arriving); the dedup/split key is md5(text), so
    * the split bucket is a prefix of the key already in hand.
    *
    * Plan shape: every doc is labeled with its TERMINAL FATE in one
    * labeled pass (b1: corrupt|clean; b2: corrupt|seen|dup|train|val|
    * test — the fates partition each batch), the fates aggregate to one
    * tiny frame, and the cumulative funnel rows are sums over THAT
    * 8-row frame. A naive funnel-of-aggregates would re-evaluate the
    * decode → probe → anti-join subtree once per stage — 6 scans of the
    * corpus where one suffices (measured 3.8 s → this shape at sf0.1;
    * at 100 TB it is the difference between one pass and six). */
  def qpIngest(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // real decode status for every doc's payload (media_id == doc_id;
    // doc_id % 7 == 0 payloads are deterministically truncated)
    val status = Multimodal
      .imageStatsQuarantined(Multimodal.syntheticPpmCorrupted(spark, d))
      .toDF().select(col("media_id").as("doc_id"), col("status"))
    // materialized ONCE: the funnel reads this frame from six branches
    // (b1 keys, b1 fates, b2 clean/corrupt splits, the probe tiers), and
    // without the cut each branch re-runs the whole decode + md5 subtree
    // (the status leg is a real per-payload image decode). The frame is
    // (id, hash, status) — kilobytes per thousand docs — and recomputes
    // from parquet on every invocation (no cross-run state).
    val docs = Dedup.cutLineage(
      injectDuplicates(T.documents(spark, d).select("doc_id", "text"))
        .join(status, "doc_id")
        .withColumn("k", md5(col("text")))
        .select("doc_id", "k", "status"),
      eager = true)
    val b1 = docs.filter(col("doc_id") % 3 =!= 0)
    val b2 = docs.filter(col("doc_id") % 3 === 0)
    val clean2 = b2.filter(col("status") === "ok")
    val b1Keys = b1.filter(col("status") === "ok").select("k").distinct()

    // the stored summary: built once over batch 1, kilobytes regardless
    // of corpus size, shipped into batch 2's scan as a foldable literal
    val seen = Sketches.buildSeenFilter(b1Keys, "k",
      expectedItems = 1000000L, numBits = 8000000L)
    val maybeSeen: Column =
      if (seen == null) lit(false) // empty history: everything is new
      else call_function("seen_might_contain", lit(seen), xxhash64(col("k")))
    val definitelyNew = clean2.filter(!maybeSeen)
    // exact tier: only the might-seen sliver joins; a left join with a
    // hit marker (not an anti join) so seen rows stay IN the frame,
    // carrying their fate instead of vanishing from the funnel
    val probed = clean2.filter(maybeSeen)
      .join(b1Keys.withColumn("_hit", lit(true)), Seq("k"), "left")
    val confirmedNew = probed.filter(col("_hit").isNull).drop("_hit")
    val seenDocs = probed.filter(col("_hit")).drop("_hit")
    // dedup keeper = min doc_id per key, via one window (no extra join)
    val newDocs = definitelyNew.unionByName(confirmedNew)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("doc_id")))
    val b2Fates = seenDocs.select(lit("seen").as("fate"))
      .unionByName(newDocs.select(
        when(col("_rn") > 1, lit("dup"))
          .otherwise(
            when(substring(col("k"), 1, 2) < "cc", lit("train"))
              .when(substring(col("k"), 1, 2) < "e6", lit("val"))
              .otherwise(lit("test"))).as("fate")))
      .unionByName(b2.filter(col("status") === "corrupt").select(lit("corrupt").as("fate")))
    val fates = b1.select(concat(lit("b1_"), col("status")).as("fate"))
      .unionByName(b2Fates.select(concat(lit("b2_"), col("fate")).as("fate")))
      .groupBy("fate").agg(count(lit(1)).as("docs"))

    // each fate feeds every cumulative stage it belongs to: explode the
    // ≤8-row fate frame into (stage, docs) and sum — the corpus subtree
    // above evaluates ONCE, not once per funnel row. Split stages appear
    // only when non-empty and the fixed stages always appear (0 when
    // empty) — exactly the oracle's UNION ALL semantics.
    import spark.implicits._
    def s(names: String*): Column = array(names.map(lit): _*)
    val funnel = fates
      .withColumn("stage", explode(
        when(col("fate") === "b1_corrupt", s("b1_corrupt"))
          .when(col("fate") === "b1_ok", s("b1_clean"))
          .when(col("fate") === "b2_corrupt", s("b2_corrupt"))
          .when(col("fate") === "b2_seen", s("b2_clean"))
          .when(col("fate") === "b2_dup", s("b2_clean", "b2_new"))
          .when(col("fate") === "b2_train",
            s("b2_clean", "b2_new", "b2_dedup_keepers", "b2_train"))
          .when(col("fate") === "b2_val",
            s("b2_clean", "b2_new", "b2_dedup_keepers", "b2_val"))
          .otherwise(s("b2_clean", "b2_new", "b2_dedup_keepers", "b2_test"))))
    val fixedStages = Seq("b1_corrupt", "b1_clean", "b2_corrupt",
      "b2_clean", "b2_new", "b2_dedup_keepers")
      .toDF("stage").withColumn("docs", lit(0L))
    funnel.select("stage", "docs").unionByName(fixedStages)
      .groupBy("stage").agg(sum("docs").as("docs"))
      .orderBy("stage")
  }

  /** Row provenance — the training-data audit primitive ("which file,
    * which position did this example come from?"): Spark's file-source
    * `_metadata` columns (`file_name`, `row_index`) surfaced as data, at
    * scan time, zero cost beyond the scan itself. A 100 TB corpus with
    * provenance columns can answer takedown/contamination audits without
    * re-deriving anything.
    *
    * The oracle-gated shape ([[qpProvenance]]) emits LAYOUT-INDEPENDENT
    * per-file stats — row count and proof that `row_index` enumerates
    * 0..n−1 contiguously per file (min/max/distinct) — so the row pins
    * the metadata-column SEMANTICS without freezing which doc sits at
    * which physical position (a testdata regen that reorders rows stays
    * green; IngestSpec covers the row-level mapping on files this repo
    * writes itself). */
  def fileProvenanceStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_name").as("file_name"),
        col("_metadata.row_index").as("row_idx"))
      .groupBy("file_name")
      .agg(count(lit(1)).as("n_rows"),
        min("row_idx").as("min_idx"),
        max("row_idx").as("max_idx"),
        countDistinct("row_idx").as("n_distinct"))
      .orderBy("file_name")

  /** QP-PROV — [[fileProvenanceStats]] over the documents table. */
  def qpProvenance(spark: SparkSession, d: String): DataFrame =
    fileProvenanceStats(spark, s"$d/documents.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qp_ingest" -> qpIngest _,
    "qp_provenance" -> qpProvenance _)

  /** DuckDB twin: the same injection self-join, the %7 corruption rule
    * (closed-form — qm_quarantine pins that truncated payloads are
    * always rejected), and the EXACT seen-set semantics the two-tier
    * bloom probe is equal to by construction. */
  val oracles: Map[String, String] = Map(
    // layout-independent: whatever order the file stores rows in,
    // row_index must enumerate 0..n-1 — so the oracle needs only the
    // row count (single-file table; the file name is the path's tail)
    "qp_provenance" ->
      ("SELECT 'documents.parquet' AS file_name, COUNT(*) AS n_rows, " +
        "CAST(0 AS BIGINT) AS min_idx, COUNT(*) - 1 AS max_idx, " +
        "COUNT(*) AS n_distinct FROM documents"),
    "qp_ingest" ->
      ("WITH base AS (SELECT doc_id, text FROM documents), " +
        "inj AS (SELECT b.doc_id, COALESCE(dn.text, b.text) AS text " +
        "FROM base b LEFT JOIN base dn ON dn.doc_id = " +
        "CASE WHEN b.doc_id % 15 = 9 THEN b.doc_id - 2 " +
        "WHEN b.doc_id % 15 = 12 THEN b.doc_id - 6 END), " +
        "d AS (SELECT doc_id, md5(text) AS k, " +
        "CASE WHEN doc_id % 7 = 0 THEN 'corrupt' ELSE 'ok' END AS status, " +
        "doc_id % 3 = 0 AS b2 FROM inj), " +
        "c1 AS (SELECT k FROM d WHERE NOT b2 AND status = 'ok'), " +
        "c2 AS (SELECT doc_id, k FROM d WHERE b2 AND status = 'ok'), " +
        "nw AS (SELECT doc_id, k FROM c2 WHERE NOT EXISTS " +
        "(SELECT 1 FROM c1 WHERE c1.k = c2.k)), " +
        "kp AS (SELECT k, MIN(doc_id) AS keeper FROM nw GROUP BY k) " +
        "SELECT 'b1_corrupt' AS stage, COUNT(*) AS docs FROM d WHERE NOT b2 AND status = 'corrupt' " +
        "UNION ALL SELECT 'b1_clean', COUNT(*) FROM d WHERE NOT b2 AND status = 'ok' " +
        "UNION ALL SELECT 'b2_corrupt', COUNT(*) FROM d WHERE b2 AND status = 'corrupt' " +
        "UNION ALL SELECT 'b2_clean', COUNT(*) FROM c2 " +
        "UNION ALL SELECT 'b2_new', COUNT(*) FROM nw " +
        "UNION ALL SELECT 'b2_dedup_keepers', COUNT(*) FROM kp " +
        "UNION ALL SELECT 'b2_' || CASE WHEN substring(k, 1, 2) < 'cc' THEN 'train' " +
        "WHEN substring(k, 1, 2) < 'e6' THEN 'val' ELSE 'test' END, COUNT(*) " +
        "FROM kp GROUP BY 1 ORDER BY stage"))
}
