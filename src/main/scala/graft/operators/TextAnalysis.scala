package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis + JSON operators over the `documents` / `events` tables —
  * the LLM-training-pipeline surface (SURVEY.md §2.2 "LLM-pipeline" row).
  *
  * Everything here is per-row expression work (tokenize, count, ratio,
  * hash) followed by an aggregate or total sort — the shape that scales:
  * expressions stay inside whole-stage codegen, no UDFs, no driver-side
  * loops, and the only shuffles are the final aggregates. Determinism:
  * per-row arithmetic on exact integers (or one correctly-rounded double
  * division) is bit-identical across engines, so these are all
  * DuckDB-oracle-checkable.
  */
object TextAnalysis {
  private val T = Tables

  /** QJ1 — JSON property extraction (R10): parse `events.props` with an
    * explicit schema (schema-on-read — `from_json` vectorizes and prunes;
    * never regex-parse JSON), bucket the value, aggregate. */
  def qjJsonProps(spark: SparkSession, d: String): DataFrame =
    T.events(spark, d)
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"),
        col("user_id"))
      .groupBy((col("k") / 10).cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("c"), countDistinct(col("user_id")).as("users"))
      .orderBy("k_bucket")

  /** QT1 — token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs — the pre-tokenizer split most BPE vocabs
    * use), aggregated per lang. */
  def qtTokenStats(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws_toks"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))")
          .cast("long").as("bpe_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum("ws_toks").as("ws_total"),
        max("ws_toks").as("ws_max"),
        sum("bpe_toks").as("bpe_total"))
      .orderBy("lang")

  /** QT2 — per-document quality signals: length, mean word length,
    * stopword ratio, unique-token ratio. Per-row only (one correctly
    * rounded double division each — cross-engine deterministic); the
    * downstream filter "keep docs above quality X" is a free pushdown. */
  def qtQuality(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .select(col("doc_id"),
        expr("length(text)").cast("long").as("n_chars"),
        expr("size(split(text, ' '))").cast("long").as("n_toks"),
        expr("size(array_distinct(split(text, ' ')))").cast("long").as("n_uniq"),
        expr("size(filter(split(text, ' '), w -> w IN ('the', 'a', 'of', 'to', 'and')))")
          .cast("long").as("n_stop"))
      .withColumn("stop_ratio", round(col("n_stop").cast("double") / col("n_toks"), 6))
      .withColumn("uniq_ratio", round(col("n_uniq").cast("double") / col("n_toks"), 6))
      .select("doc_id", "n_chars", "n_toks", "stop_ratio", "uniq_ratio")
      .orderBy("doc_id")

  /** QT3 — language-ID heuristic: character-bigram profile scores via
    * replace-count (integer arithmetic only — `(len(s)-len(replace(s,g,'')))
    * / len(g)` is the classic occurrence count, identical in any engine).
    * A real lang-ID model would load n-gram profiles per language; the
    * engine-side shape (per-row score → argmax → aggregate) is what
    * matters at 100 TB and is fully exercised here. */
  def qtLangId(spark: SparkSession, d: String): DataFrame = {
    def occurrences(g: String) =
      ((length(col("text")) - length(regexp_replace(col("text"), g, ""))) / g.length)
        .cast("long")
    val scoreEn = (occurrences("th") + occurrences("er") + occurrences("the ")).as("s_en")
    val scoreRo = (occurrences("de ") + occurrences("la ") + occurrences("el ")).as("s_ro")
    T.documents(spark, d)
      .select(col("lang"), col("text"))
      .withColumn("s_en", scoreEn).withColumn("s_ro", scoreRo)
      .withColumn("pred",
        when(col("s_en") >= col("s_ro") * 2, lit("en"))
          .when(col("s_ro") > col("s_en"), lit("romance"))
          .otherwise(lit("unknown")))
      .groupBy("lang", "pred").agg(count(lit(1)).as("c"))
      .orderBy("lang", "pred")
  }

  /** QT4 — document fingerprinting: winnowing-style min-hash-of-shingles.
    * fingerprint = MIN(md5(4-token shingle)) per doc — a stable content
    * fingerprint robust to local edits, computed entirely per-row
    * (transform + md5 + array_min stay in codegen; no shuffle until the
    * group-by on fingerprints that finds collisions). */
  def qtFingerprint(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    T.documents(spark, d)
      // native word_shingles (one split, codegen) + explode + min
      // aggregate with a map-side partial — the shape that survives
      // 100 TB. (An array_min-over-lambda variant re-splits the text per
      // shingle in interpreted eval; see graft.functions.WordShingles.)
      .select(col("doc_id"),
        explode(expr("word_shingles(text, 4)")).as("shingle"))
      .groupBy("doc_id").agg(min(md5(col("shingle"))).as("fp"))
      .orderBy("doc_id")
  }

  /** QT5 — PII scrubbing: regex redaction of email-shaped spans. The
    * corpus carries no PII, so a deterministic synthetic email is
    * injected into every 10th doc first — the scrub then has real work
    * whose effect (docs touched, chars removed) is integer-exact. The
    * pipeline shape (per-row regexp_replace chain → aggregate) is the
    * production scrub pass; at scale it's pure scan-side codegen'd
    * string work. */
  def qtScrub(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .withColumn("raw",
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact: user"), col("doc_id"), lit("@example.com")))
          .otherwise(col("text")))
      .withColumn("scrubbed",
        regexp_replace(col("raw"), "[a-z0-9]+@[a-z]+\\.[a-z]+", "[EMAIL]"))
      .select(col("lang"),
        (col("raw") =!= col("scrubbed")).cast("int").as("touched"),
        (length(col("raw")) - length(col("scrubbed"))).cast("long").as("removed"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), sum("touched").cast("long").as("scrubbed_docs"),
        sum("removed").as("chars_removed"))
      .orderBy("lang")

  /** QT6 — vocabulary statistics: global top-20 tokens by frequency
    * (explode → count → rank-limited). At scale: partial counts map-side,
    * one shuffle on token, TakeOrdered merge — never a driver-side
    * vocabulary. */
  def qtVocab(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  /** QT7 — deterministic dataset split (train/val/test by content hash):
    * the split must be a pure function of the record so it is stable
    * across runs, partitionings, and engines — md5 here (cross-engine),
    * xxhash64 in a pure-Spark pipeline. Never `rand()`: resampling on
    * every action leaks val into train. */
  def qtSplit(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      // lexicographic compare of the lowercase hex prefix == numeric
      // compare of the first byte, with no hex-to-int dialect risk
      .withColumn("bucket", substring(md5(col("text")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", lit("train"))     // 0x00-0xcb ~ 80%
          .when(col("bucket") < "e6", lit("val"))    // 0xcc-0xe5 ~ 10%
          .otherwise(lit("test")))                   // 0xe6-0xff ~ 10%
      .groupBy("split")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
      .orderBy("split")

  /** QT-GSPLIT — GROUP-aware train/val/test split: every document of a
    * SOURCE lands in one split (assignment hashes the source, not the
    * doc), the leakage-safe discipline when near-duplicates cluster
    * within a group — a per-doc split (qt_split) would scatter a
    * domain's boilerplate twins across train AND test, leaking eval
    * content into training. Same deterministic md5-prefix device as
    * [[qtSplit]], one level up — the no-leak property holds by
    * construction (split is a function of source alone), and the
    * two-level report (sources/docs/chars per split) pins the
    * assignment: a source straying into a second split would shift two
    * rows' source counts. */
  def qtGroupSplit(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .withColumn("bucket", substring(md5(col("source")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", lit("train"))
          .when(col("bucket") < "e6", lit("val"))
          .otherwise(lit("test")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("sources"),
        sum("docs").as("docs"), sum("chars").as("chars"))
      .orderBy("split")

  /** QP — the end-to-end training-data prep pipeline as ONE declarative
    * plan: PII scrub → quality gate → exact dedup (min-id keeper) →
    * deterministic content-hash split → per-(lang, split) report. Each
    * stage is oracle-checked in isolation elsewhere (qt_scrub,
    * qt_quality, qd_exact_dedup, qt_split); this entry pins their
    * COMPOSITION — the shape a real corpus-prep job runs.
    *
    * Scale shape: scrub, quality signals, and the split hash are all
    * scan-side codegen'd expression work; Catalyst pipelines them into
    * the pre-shuffle stage, so the whole pipeline costs exactly two
    * shuffles (dedup group-by, final report group-by) regardless of how
    * many per-row stages compose. The quality gate uses integer
    * cross-multiplication (uniq*10 >= toks*3), not a float ratio — no
    * rounding drift across engines.
    */
  def qpPrepPipeline(spark: SparkSession, d: String): DataFrame = {
    val cleaned = T.documents(spark, d)
      .withColumn("raw",
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact: user"), col("doc_id"), lit("@example.com")))
          .otherwise(col("text")))
      .withColumn("clean",
        regexp_replace(col("raw"), "[a-z0-9]+@[a-z]+\\.[a-z]+", "[EMAIL]"))
    val gated = cleaned
      .withColumn("n_toks", size(split(col("clean"), " ")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(split(col("clean"), " "))).cast("long"))
      .filter(col("n_toks") >= 5 && col("n_uniq") * 10 >= col("n_toks") * 3)
    val deduped = gated
      .groupBy("clean")
      .agg(min("doc_id").as("keeper"), expr("min_by(lang, doc_id)").as("lang"))
    deduped
      .withColumn("bucket", substring(md5(col("clean")), 1, 2))
      .withColumn("split",
        when(col("bucket") < "cc", lit("train"))
          .when(col("bucket") < "e6", lit("val"))
          .otherwise(lit("test")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("docs"), sum(length(col("clean"))).cast("long").as("chars"))
      .orderBy("lang", "split")
  }

  /** QT8 — benchmark decontamination: find training docs sharing an
    * 8-token shingle with any eval-set doc (the standard n-gram-overlap
    * contamination check run before training on scraped corpora). The
    * corpus has no natural overlap, so contamination is injected
    * deterministically first: every `doc_id % 7 == 3` train doc gets the
    * leading 8-token span of its marker eval doc appended — the detector
    * then has real positives whose (train, eval, shared-count) triples are
    * integer-exact in any engine.
    *
    * Scale shape: the eval set is small by nature (benchmarks are KBs, the
    * corpus is TBs), so its distinct shingle set is BROADCAST and the
    * whole check is one map-side join over the train scan — no shuffle of
    * the 100 TB side; the only shuffle is the final per-pair count. Train
    * shingling is the native codegen'd `word_shingles` at the scan. */
  def qtContamination(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = T.documents(spark, d)
    val evalDocs = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_doc"), col("text"))
    val spans = evalDocs.select(col("eval_doc"),
      array_join(slice(split(col("text"), " "), 1, 8), " ").as("span"))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(spans), (col("doc_id") % 10) * 50 === col("eval_doc"))
      .select(col("doc_id").as("train_doc"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" "), col("span")))
          .otherwise(col("text")).as("text"))
    val trainSh = train.select(col("train_doc"),
      explode(expr("word_shingles(text, 8)")).as("sh"))
    val evalSh = evalDocs.select(col("eval_doc"),
      explode(expr("word_shingles(text, 8)")).as("sh")).distinct()
    trainSh.join(broadcast(evalSh), "sh")
      .groupBy("train_doc", "eval_doc")
      .agg(countDistinct(col("sh")).as("shared"))
      .orderBy("train_doc", "eval_doc")
  }

  /** QT9 — repetition signal (the "duplicate n-gram fraction" quality
    * rule): fraction of a doc's word 3-grams that are repeats of an
    * earlier 3-gram in the same doc. Boilerplate/spam pages score high
    * and get filtered before training. Entirely scan-side: native
    * `word_shingles` + `array_distinct` per row, one exact double
    * division rounded — no shuffle except the final sort. */
  def qtRepetition(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    T.documents(spark, d)
      .select(col("doc_id"), expr("word_shingles(text, 3)").as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_sh"),
        size(array_distinct(col("sh"))).cast("long").as("n_uniq"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_uniq").cast("double") / col("n_sh"), 6))
      .orderBy("doc_id")
  }

  /** QT10 — TF-IDF top terms per document: tf = in-doc term count, idf =
    * ln((N+1)/(df+1)), top-3 terms per doc by (score desc, token). The
    * classic term-weighting pipeline: one explode + two aggregates (term
    * frequency per doc; document frequency per token) + a tf⋈df join on
    * the token + a partitioned rank window. The df side is deliberately
    * NOT broadcast-hinted: a web-scale corpus has a vocabulary of
    * billions of tokens — far past any broadcast limit — so forcing the
    * hint would turn a working plan into a driver OOM at 100 TB. AQE
    * picks broadcast at runtime when the measured df side is small (it
    * is here), and falls back to a shuffle join on the token — a
    * high-cardinality, skew-tolerant key — when it isn't. Nothing ever
    * materializes a dense doc×term matrix. ln differs across engines
    * only in the last ulp — scores are compared rounded at 1e-6 with an
    * exact (tf, token) tiebreak. */
  def qtTfidf(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = T.documents(spark, d)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .join(broadcast(nDocs)) // 1 row — always broadcastable
      .withColumn("score",
        col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("token"), col("tf"),
        round(col("score"), 6).as("score"), col("rn").cast("long").as("rn"))
      .orderBy("doc_id", "rn")
  }

  /** BM25 retrieval scoring (Robertson et al.'s Okapi BM25 with the
    * Lucene-default idf `ln(1 + (N − df + 0.5)/(df + 0.5))` — public
    * knowledge): rank the corpus against a fixed query term set. This is
    * the RETRIEVAL primitive next to [[qtTfidf]]'s vectorization — what a
    * RAG/search layer runs per query — and the engine-side shape is the
    * point: tf via conditional aggregates on the exploded token stream
    * (terms filtered BEFORE the shuffle, so only matching tokens move),
    * corpus statistics (N, Σdl, per-term df) reduced to ONE broadcast
    * row, per-doc score as pure expression math, rank-limited output.
    * At 100 TB: one token-scan pass + a bins-sized stats row — the
    * score join never shuffles the corpus.
    *
    * Determinism across engines: tf/df/dl/N are exact integers; the
    * double expression (term order, k1/b literals, ln form) is written
    * identically in the Spark plan and the oracle SQL, with k1+1
    * embedded as the literal `2.2` on both sides (computing `1.2 + 1`
    * at runtime need not be the same double as the literal); terms sum
    * in fixed written order; final score rounded 1e-6 and RANKED ON THE
    * ROUNDED VALUE with a doc_id tiebreak. */
  def bm25TopDocs(docs: DataFrame, terms: Seq[String], topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty)
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val hits = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isin(terms: _*))
    val tf = hits.groupBy("doc_id").agg(
      sum(when(col("token") === terms.head, 1L).otherwise(0L)).as("tf0"),
      terms.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf${i + 1}")
      }: _*)
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"df$i")
    }
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .crossJoin(hits.select("doc_id", "token").distinct()
        .agg(dfCols.head, dfCols.tail: _*))
    val scoreTerms = terms.indices.map { i =>
      s"""CASE WHEN tf$i > 0 THEN
            ln(((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) + 1.0) *
            ((CAST(tf$i AS DOUBLE) * 2.2) /
             (CAST(tf$i AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
          ELSE 0.0 END"""
    }
    // TakeOrderedAndProject FIRST (per-partition heaps of topN, driver
    // merges topN — never a global single-task window over every scored
    // doc), then row_number ranks only the bounded 20-row tail
    val w = Window.orderBy(col("bm25").desc, col("doc_id"))
    tf.join(dl, "doc_id")
      .join(broadcast(stats)) // 1 row — always broadcastable
      .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / n_docs"))
      .withColumn("hits", expr(terms.indices.map(i => s"tf$i").mkString(" + ")))
      .withColumn("bm25", round(expr(scoreTerms.mkString(" + ")), 6))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topN)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select("doc_id", "hits", "bm25", "rn")
      .orderBy("rn")
  }

  /** QT16 — [[bm25TopDocs]] for the 3-term query {join, vector, scan}
    * (high-df corpus terms: every doc scores, so ranking — not matching
    * — is what the hash pins), top 20. */
  def qtBm25(spark: SparkSession, d: String): DataFrame =
    bm25TopDocs(T.documents(spark, d), Seq("join", "vector", "scan"), topN = 20)

  /** BM25 against a QUERY TABLE — [[bm25TopDocs]] generalized from a
    * fixed term list compiled into the plan (one column pair per term —
    * right for 3 terms, wrong shape for a workload of queries) to an
    * arbitrary `(query_id, term)` DataFrame: the batch-retrieval shape a
    * search/RAG layer actually runs, scoring every query in ONE pass
    * over the corpus.
    *
    * Plan shape, scale-first: the token stream is semi-joined against
    * the (broadcast) distinct term set BEFORE the tf shuffle, so only
    * tokens some query mentions ever move; per-term df and the
    * one-row corpus stats reduce once and broadcast; the per-(query,
    * doc) score is a groupBy over the term-match rows — corpus rows
    * never fan out by query count, matches do. Top-N per query is a
    * PARTITIONED window (never a global single-task sort).
    *
    * Determinism with a variable term set: per-term contributions sum
    * in GROUP-BY order, which no engine pins for doubles — so each
    * term's contribution is quantized to integer MICRO-UNITS
    * (`round(c·1e6)` as BIGINT) first and the per-(query, doc) score is
    * an exact integer sum, order-free in both engines; ranking compares
    * the integer (doc_id tiebreak) and `bm25` is the micro-unit sum
    * scaled back. Semantics differ from [[bm25TopDocs]] only in that
    * 1e-6 per-term quantization. Terms absent from the corpus (df = 0)
    * simply contribute no match rows. */
  def bm25QueryTable(docs: DataFrame, queryTerms: DataFrame, topN: Int): DataFrame = {
    val q = queryTerms
      .select(col("query_id").cast("long"), col("term")).distinct()
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val hits = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .join(broadcast(q.select(col("term").as("token")).distinct()),
        Seq("token"), "left_semi")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dft = hits.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    bm25Score(hits.join(dl, "doc_id").select("token", "doc_id", "tf", "dl"),
      dft, stats, q, topN)
  }

  /** The shared BM25 scoring tail — ONE implementation so every caller
    * (the corpus-scan path [[bm25QueryTable]] and the stored-index
    * serve path [[TextIndex.serve]]) scores bit-equally by
    * construction: identical expression text, identical integer
    * micro-unit sums, identical rank comparisons (TextIndexSpec pins
    * the equality).
    * Inputs are exact integers however they were produced (scan-side
    * aggregation or a loaded index artifact).
    *
    * `hits`: (token, doc_id, tf, dl) match rows; `dft`: (token, df);
    * `stats`: one (n_docs, sum_dl) row; `q`: (query_id, term) workload.
    * `dft` is semi-joined to the query terms BEFORE broadcasting, so a
    * caller may safely pass the full corpus document-frequency table (a
    * real vocabulary runs to millions of tokens — broadcasting it
    * unpruned would risk driver/executor OOM); only the term-count-sized
    * slice ever ships. */
  private[operators] def bm25Score(hits: DataFrame, dft: DataFrame,
                                   stats: DataFrame, q: DataFrame,
                                   topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // identical literals/shape to bm25TopDocs' per-term CASE, then
    // micro-unit quantization for the order-free sum
    val cTerm = expr(
      """CAST(round((ln(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) + 1.0) *
           ((CAST(tf AS DOUBLE) * 2.2) /
            (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))) * 1000000.0, 0) AS BIGINT)""")
    val w = Window.partitionBy("query_id").orderBy(col("c").desc, col("doc_id"))
    val qTok = q.withColumnRenamed("term", "token")
    val dftQ = dft.join(broadcast(qTok.select("token").distinct()),
      Seq("token"), "left_semi")
    hits
      .join(broadcast(qTok), "token")
      .join(broadcast(dftQ), "token")
      .join(broadcast(stats))
      .withColumn("c_term", cTerm)
      .groupBy("query_id", "doc_id")
      .agg(sum("tf").as("hits"), sum("c_term").as("c"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topN)
      .withColumn("bm25", round(col("c").cast("double") / 1000000.0, 6))
      .select("query_id", "doc_id", "hits", "bm25", "rn")
      .orderBy("query_id", "rn")
  }

  /** The (query_id, term) workload qt_bm25_multi runs: query 1 is
    * qt_bm25's own term set (a built-in cross-check — same ranking must
    * emerge from the table-driven path), query 3 carries a term absent
    * from the corpus (df = 0 leg). */
  val Bm25MultiWorkload: Seq[(Long, String)] = Seq(
    1L -> "join", 1L -> "vector", 1L -> "scan",
    2L -> "sort", 2L -> "merge", 2L -> "window",
    3L -> "filter", 3L -> "column", 3L -> "zzzabsent")

  /** QT17 — [[bm25QueryTable]] over [[Bm25MultiWorkload]], top 10 per
    * query. */
  def qtBm25Multi(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    bm25QueryTable(T.documents(spark, d),
      Bm25MultiWorkload.toDF("query_id", "term"), topN = 10)
  }

  /** Sequence-length bucketing with padding-waste accounting — the
    * dynamic-batching primitive (bucketed batching, as in Tensor2Tensor
    * /fairseq — public knowledge): batching same-length sequences
    * together bounds the tokens wasted on padding, and CHOOSING the
    * bucket edges needs exactly this report — per bucket, how many
    * docs, how many real tokens, and how many pad tokens the bucket cap
    * would allocate. One scan, groupBy over ≤ |edges|+1 buckets with
    * map-side partial aggregation — a bins-sized frame at any corpus
    * size.
    *
    * Buckets are a fixed literal CASE chain over `edges` (doc length in
    * whitespace tokens ≤ edge), overflow clamped to the last edge —
    * integer-exact compares both engines, no float log2 binning. Docs
    * longer than the top edge count their cap at that edge (they would
    * be truncated to it), so padded ≥ 0 always. */
  def lengthBuckets(docs: DataFrame, edges: Seq[Int]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      s"edges must be ascending and distinct: $edges")
    val len = size(split(col("text"), " ")).cast("long")
    val cap = edges.init.foldRight(lit(edges.last.toLong): Column) { (e, rest) =>
      when(len <= e, e.toLong).otherwise(rest)
    }
    docs
      .select(least(len, lit(edges.last.toLong)).as("len"), cap.as("bucket_cap"))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("docs"), sum("len").as("tokens"))
      .withColumn("padded", col("docs") * col("bucket_cap") - col("tokens"))
      .withColumn("waste",
        round(col("padded").cast("double") / (col("docs") * col("bucket_cap")), 6))
      .select("bucket_cap", "docs", "tokens", "padded", "waste")
      .orderBy("bucket_cap")
  }

  /** QP8 — [[lengthBuckets]] at the {32, 64, 128, 256} edge ladder. */
  def qpLengthBuckets(spark: SparkSession, d: String): DataFrame =
    lengthBuckets(T.documents(spark, d), Seq(32, 64, 128, 256))

  /** QP2 — weighted domain mixture: deterministic hash-sampling at
    * per-domain rates (here: keep all `en`, ~20% of everything else) — how
    * training mixtures are rebalanced without a shuffle or an RNG. The
    * keep decision is a pure function of (lang, text), so the sample is
    * stable across runs, partitionings, and engines — `rand()`-based
    * sampling resamples per action and is not reproducible. Hex-prefix
    * compare on md5, same mechanism qt_split pins. 'g0' > every hex
    * bucket, so it spells "keep 100%" without a special case. */
  def qpMixture(spark: SparkSession, d: String): DataFrame =
    T.documents(spark, d)
      .withColumn("bucket",
        substring(md5(concat(col("lang"), lit(":"), col("text"))), 1, 2))
      .withColumn("keep",
        (col("bucket") < when(col("lang") === "en", lit("g0")).otherwise(lit("33")))
          .cast("int"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum("keep").cast("long").as("kept"),
        sum(col("keep") * col("n_chars")).cast("long").as("chars_kept"))
      .orderBy("lang")

  /** QP5 — exact-k per-stratum sampling ("deterministic reservoir"):
    * the fixed-BUDGET companion to [[qpMixture]]'s fixed-RATE sampling —
    * "give me exactly k docs per language for an eval set / human
    * review / pilot run". Classic reservoir sampling is sequential and
    * RNG-seeded; the distributed, reproducible form is bottom-k by a
    * seeded content hash: rank docs inside each stratum by
    * md5(seed || doc_id) and keep the k smallest. Any engine, any
    * partitioning, any run produces the same sample, and changing the
    * seed string redraws it.
    *
    * Scale shape: rank-limit windows compile to WindowGroupLimit
    * (pinned in PlanGuardSpec), so every map partition prunes to k
    * rows per stratum BEFORE the shuffle — a billion-doc language ships
    * partitions×k rows, not a billion; the per-stratum reducer never
    * sees the stratum's full population. */
  def qpSample(spark: SparkSession, d: String, k: Int = 20, seed: String = "sample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    T.documents(spark, d)
      .select(col("lang"), col("doc_id"),
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy("lang").orderBy("hk", "doc_id")).cast("long"))
      .filter(col("rn") <= k)
      .select("lang", "doc_id", "rn")
      .orderBy("lang", "rn")
  }

  /** QP-CAP — per-source document cap (domain curation): the
    * RefinedWeb/Gopher-style step that stops any one domain from
    * dominating the corpus — rank each source's documents by a quality
    * key and keep at most `k`, reporting the per-source funnel
    * (docs/chars in vs kept, and the kept set's score floor). The
    * quality key is INTEGER-exact parts-per-million uniqueness
    * (`n_uniq * 1e6 div n_toks`) so the ranking — not just the output —
    * is bit-identical across engines; ties break on `doc_id`.
    *
    * Scale shape: the kept leg is a rank-limit window (partition by
    * source), which compiles to WindowGroupLimit — map partitions prune
    * to k rows per source BEFORE the shuffle, so a billion-doc domain
    * ships partitions×k rows, not a billion (same device as
    * [[qpSample]]). The totals leg is a plain partial aggregate
    * (map-side combine). Both legs end at #sources rows, so the final
    * join broadcasts. */
  def sourceCapFunnel(docs: DataFrame, k: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("source"), col("doc_id"),
      expr("length(text)").cast("long").as("n_chars"),
      expr("(size(array_distinct(split(text, ' '))) * CAST(1000000 AS BIGINT)) " +
        "div size(split(text, ' '))").as("score"))
    val kept = scored
      .withColumn("rn", row_number()
        .over(Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .groupBy("source")
      .agg(count(lit(1)).as("docs_kept"), sum("n_chars").as("chars_kept"),
        min("score").as("min_kept_score"))
    scored.groupBy("source")
      .agg(count(lit(1)).as("docs_in"), sum("n_chars").as("chars_in"))
      .join(kept, Seq("source"))
      .select("source", "docs_in", "docs_kept", "chars_in", "chars_kept",
        "min_kept_score")
      .orderBy("source")
  }

  /** QP6 — [[sourceCapFunnel]] over `documents` at k=15 (binding at
    * every SF: sources hold ≥25 docs even at sf0.001). */
  def qpSourceCap(spark: SparkSession, d: String): DataFrame =
    sourceCapFunnel(T.documents(spark, d))

  /** QT-PMI — collocation extraction: the top bigrams by pointwise
    * mutual information, `pmi = ln(P(w₁w₂) / (P(w₁)·P(w₂)))` with
    * unigram probabilities over the token stream and bigram
    * probabilities over the bigram stream — the classic phrase-mining /
    * tokenizer-seeding signal (high PMI = the pair co-occurs far above
    * chance). Min-support filter first (count ≥ minCount) so the log
    * ratios are stable and the rank join stays tiny; all counts are
    * exact aggregates, the single `ln` per surviving bigram is an
    * integer-ratio log (same cross-engine discipline as
    * [[bigramSurprise]]). Scan-side shingles → two count aggregates →
    * broadcast-sized rank tail: nothing here is corpus-quadratic. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 10, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val uni = toks.groupBy("w").agg(count(lit(1)).as("c1"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val bi = docs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(explode(call_function("word_shingles", col("text"), lit(2))).as("bg"))
    val nBi = bi.agg(count(lit(1)).as("n_bi"))
    val c2 = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    c2
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .withColumn("pmi", round(
        log(col("c2").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_bi") * col("c1a") * col("c1b"))), 4))
      .select("bg", "c2", "pmi")
      // global top-k WITHOUT a single-partition rank window: orderBy +
      // limit plans as TakeOrderedAndProject (per-partition heaps, one
      // tiny driver merge) — the same shape as qt_vocab
      .orderBy(col("pmi").desc, col("bg"))
      .limit(k)
      .orderBy(col("pmi").desc, col("bg"))
  }

  def qtPmi(spark: SparkSession, d: String): DataFrame =
    pmiCollocations(T.documents(spark, d))

  /** QT-ENT — per-document Shannon entropy of the token distribution,
    * H = ln n − (Σ c·ln c)/n over the doc's token histogram, plus the
    * [0,1]-normalized variant H/ln(n_uniq) — the information-density
    * quality signal (low = repetitive boilerplate, ≈1 = every token
    * novel), complementary to [[qtQuality]]'s uniqueness RATIO (which
    * can't tell "one token repeated 99 times plus one other" from a
    * balanced 50/50 split) and to [[bigramSurprise]]'s corpus-LM view.
    * Cross-engine exactness: each histogram term ln(c) is a log of an
    * exact integer, rounded at 1e-9 and summed c-weighted as BIGINTs —
    * order-free — so only ln(n), ln(n_uniq) and two divisions run in
    * floating point, on identical inputs in identical order.
    *
    * Scale shape: the distributed histogram — explode → groupBy
    * (doc_id, token) with map-side combine → groupBy doc_id. Both
    * shuffles key on doc-bounded cardinalities; Σ c·q ≤ n·max(q)
    * keeps the weighted sum far inside a long even for million-token
    * docs. No driver state, no per-doc arrays wider than the scan. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
    val hist = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val hExpr = log(col("n_toks").cast("double")) -
      col("s").cast("double") / lit(1e9) / col("n_toks")
    hist.groupBy("doc_id")
      .agg(sum("c").as("n_toks"), count(lit(1)).as("n_uniq"),
        sum(col("c") *
          round(log(col("c").cast("double")) * lit(1e9)).cast("long")).as("s"))
      .select(col("doc_id"), col("n_toks"), col("n_uniq"),
        round(hExpr, 4).as("entropy"),
        when(col("n_uniq") > 1,
          round(hExpr / log(col("n_uniq").cast("double")), 4))
          .otherwise(lit(0.0)).as("norm_entropy"))
      .orderBy("doc_id")
  }

  /** QT9 — [[tokenEntropy]] over `documents`. */
  def qtEntropy(spark: SparkSession, d: String): DataFrame =
    tokenEntropy(T.documents(spark, d))

  /** QT-NORM — Unicode canonicalization over the corpus via the native
    * [[graft.functions.UnicodeNorm]] / [[graft.functions.StripAccents]]
    * expressions. The synthetic corpus is ASCII, so each doc gets a
    * deterministic non-ASCII injection (decomposed e+◌́, precomposed é,
    * a+◌̊, n+◌̃, the ﬁ ligature, or plain o — built from hex so both
    * engines construct identical BYTES). The oracle is a genuine
    * cross-implementation differential where DuckDB has the function
    * (JDK Normalizer vs utf8proc for NFC and strip_accents) and
    * closed-form where it doesn't (NFKC: the expected post-fold image
    * of each injected piece is a published Unicode fact, so the oracle
    * rebuilds it from hex). Length deltas pin composition state
    * (decomposed pair → one code point), not just hashes. */
  def qtNormalize(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val piece = element_at(
      array(Seq("65CC81", "C3A9", "61CC8A", "6ECC83", "EFAC81", "6F").map(lit): _*),
      (col("doc_id") % 6 + 1).cast("int"))
    T.documents(spark, d)
      .withColumn("raw", concat(substring(col("text"), 1, 24), lit(" "),
        decode(unhex(piece), "UTF-8"), lit("x")))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(expr("unicode_norm(raw, 'NFC')")).cast("long").as("len_nfc"),
        md5(expr("unicode_norm(raw, 'NFC')")).as("nfc_md5"),
        md5(expr("unicode_norm(raw, 'NFKC')")).as("nfkc_md5"),
        expr("strip_accents(raw)").as("stripped"))
      .orderBy("doc_id")
  }

  /** Deterministic WEIGHTED exact-k sampling per stratum — the priority
    * sampling of Efraimidis & Spirakis 2006 ("Weighted random sampling
    * with a reservoir", public knowledge): each row draws priority
    * `u^(1/w)` with `u` uniform in (0,1], and the k highest priorities
    * per stratum are exactly a weighted-without-replacement sample. The
    * distributed, reproducible form replaces the RNG with a seeded
    * integer hash — TWO LCG rounds mod the Mersenne prime 2^31−1, seed
    * folded into the first (one round is nearly linear in the seed: a
    * seed bump shifts every row's u by the same constant mod 1, which
    * barely reorders; the second round scrambles the shift — pinned by
    * the redraw test). Closed form in ANY engine, which is what makes
    * the oracle row possible. Operands are pre-modded so the largest
    * intermediate is < 2^62 — no overflow at any id scale.
    * Rows with non-positive weight are EXCLUDED — the w→0 limit of the
    * priority is 0, i.e. "never sample".
    *
    * Same scale shape as [[qpSample]]: the rank-limit window compiles
    * to WindowGroupLimit, so each map partition prunes to k rows per
    * stratum before the shuffle. The only cross-engine subtlety is that
    * ranking compares `pow` results — IEEE doubles on both sides, so a
    * rank flip would need two priorities within 1 ulp (never observed;
    * the gate would catch it). */
  def weightedSample(df: DataFrame, stratumCol: String, weightCol: String,
                     idCol: String, k: Int, seed: Long = 12345L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = 2147483647L
    val h1 = (col(idCol) % m * 1103515245L + lit(seed % m)) % m
    val u = ((h1 * 1103515245L + 12345L) % m + 1L) / lit(2147483648.0)
    df.filter(col(weightCol) > 0)
      .withColumn("_pri", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .withColumn("rn", row_number()
        .over(Window.partitionBy(stratumCol).orderBy(col("_pri").desc, col(idCol)))
        .cast("long"))
      .filter(col("rn") <= k)
      .drop("_pri")
  }

  /** QP7 — weighted per-language sampling, weight = token count: the
    * "sample proportionally to content volume" draw (long docs carry
    * more of the training distribution than boilerplate stubs). Oracle
    * mirrors the LCG + pow priority closed-form in DuckDB. */
  def qpWeightedSample(spark: SparkSession, d: String, k: Int = 20): DataFrame =
    weightedSample(
      T.documents(spark, d).select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w_toks")),
      "lang", "w_toks", "doc_id", k)
      .select("lang", "doc_id", "w_toks", "rn")
      .orderBy("lang", "rn")

  /** QP6 — overlapping document chunking (the RAG/embedding prep step,
    * distinct from [[qpPack]]'s cross-doc packing): each doc splits into
    * token windows of `chunk` tokens advancing by `stride` (< chunk ⇒
    * overlap), the shape retrieval corpora and long-doc training shards
    * are cut into. Chunk boundaries are pure per-row arithmetic — the
    * explode rides the scan, no shuffle until the final sort — and each
    * chunk carries an md5 content fingerprint, so the oracle (same
    * slicing in DuckDB) proves BYTE-EXACT chunk content, not just
    * counts. Every token lands in ≥1 chunk: the window start walks while
    * start ≤ n-1, and the tail window clamps. */
  def qpChunk(spark: SparkSession, d: String,
              chunk: Int = 64, stride: Int = 48): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    T.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(s"sequence(0, (size(toks) - 1) div $stride)")).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(s"slice(toks, start * $stride + 1, $chunk)").as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("ctoks"))).as("fingerprint"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** QP3 — sequence packing (token-budget chunking): concatenate docs in
    * doc_id order into a token stream and report the 2048-token chunk each
    * doc STARTS in — the document-carryover packing used when training
    * sequences are cut from a concatenated corpus. chunk = floor(
    * start_offset / capacity) where start_offset is the exclusive prefix
    * sum of token counts.
    *
    * The prefix sum reuses Q9's distributed two-phase shape (key-range
    * buckets → per-bucket windows → exploded bucket offsets, no global
    * single-partition window), so packing scales like any other aggregate:
    * one narrow scan + one window per bucket + a tiny offset broadcast.
    * For strict capacity packing (docs never straddle chunks) see
    * [[packGreedy]]. */
  def qpPack(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nb = 32
    val cap = 2048L
    val docs = T.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
    val maxKey = docs.agg(max("doc_id").as("mk"))
    val base = docs.join(broadcast(maxKey))
      .withColumn("pid", (col("doc_id") * nb / (col("mk") + 1)).cast("int"))
    val wLocal = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy("pid").agg(sum("n_toks").as("ptot"))
      .filter(col("pid") < nb - 1)
      .select(explode(sequence(col("pid") + 1, lit(nb - 1))).as("pid"), col("ptot"))
      .groupBy("pid").agg(sum("ptot").as("off"))
    base
      .withColumn("lcum", sum(col("n_toks")).over(wLocal))
      .join(broadcast(offsets), Seq("pid"), "left")
      .withColumn("cum", col("lcum") + coalesce(col("off"), lit(0L)))
      .withColumn("chunk", ((col("cum") - col("n_toks")) / cap).cast("long"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("docs"), sum("n_toks").as("toks"),
        min("doc_id").as("first_doc"))
      .orderBy("chunk")
  }

  /** Strict greedy sequence packing: docs are packed in doc_id order into
    * bins of at most `capacity` tokens; a doc never straddles bins (a bin
    * closes when the next doc would overflow it; a single doc larger than
    * `capacity` gets a bin of its own). Greedy next-fit is inherently
    * sequential, so it runs per-shard: range-partition on doc_id, pack
    * each shard independently in one `mapPartitions` pass (the way real
    * training pipelines pack per worker shard). Bin ids are
    * `shard * 2^32 + local_seq` — globally unique without coordination.
    * Output: (doc_id, n_toks, bin). Wasted capacity is bounded: next-fit
    * uses at most 2× the optimal bin count per shard, +1 partial bin per
    * shard boundary. Validated by PackingSpec (capacity, order, coverage,
    * determinism, bin-count bound). */
  def packGreedy(docs: DataFrame, capacity: Long, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(capacity > 0 && shards > 0, "capacity and shards must be positive")
    docs.select(col("doc_id").cast("long"), col("n_toks").cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(shards, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .mapPartitions { it =>
        val shard = org.apache.spark.TaskContext.getPartitionId().toLong
        var localBin = 0L
        var used = 0L
        var first = true
        it.map { case (id, toks) =>
          if (!first && used + toks > capacity) { localBin += 1; used = 0L }
          first = false
          used += toks
          (id, toks, (shard << 32) | localBin)
        }
      }
      .toDF("doc_id", "n_toks", "bin")
  }

  /** QT9 — perplexity-proxy quality scoring: per-doc average bigram
    * surprisal, −ln P(w₂|w₁), under an add-one-smoothed bigram model of
    * the corpus itself — the LM-based quality filter of CCNet/CC-style
    * pipelines (docs whose token transitions are improbable under the
    * corpus distribution are boilerplate, spam, or wrong-language), here
    * with the corpus as its own LM so no external model ships.
    *
    * Shape at scale: bigrams come off the scan via the native
    * `word_shingles` (docs shorter than 2 tokens carry no bigram and are
    * excluded); the count tables are VOCABULARY-bounded, not
    * corpus-bounded, so the two count joins shuffle (bigram, count)
    * rows; the per-doc average sums exact decimals (float sum order
    * across partitions can't drift the oracle compare — the qs_centroid
    * device). Smoothing: P = (c₂+1)/(c₁+V), V = corpus distinct tokens. */
  def qtBigramSurprise(spark: SparkSession, d: String): DataFrame =
    bigramSurprise(T.documents(spark, d))

  /** [[qtBigramSurprise]] over any (doc_id, text) frame. */
  def bigramSurprise(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val bi = docs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"),
        explode(call_function("word_shingles", col("text"), lit(2))).as("bg"))
    val c2 = bi.groupBy("bg").agg(count(lit(1)).as("c2"))
    // first-token counts fold from the ALREADY-AGGREGATED bigram table
    // (Σ c2 grouped by w1 ≡ counting the stream again, at vocab² input
    // size instead of corpus size) — saves a second full-stream pass
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    val v = docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("vocab"))
    bi.join(c2, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .crossJoin(broadcast(v))
      .withColumn("s",
        -log((col("c2") + lit(1)).cast("double") / (col("c1") + col("vocab")).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("s").cast(DecimalType(28, 12))).cast("double") / count(lit(1)), 4)
          .as("avg_surprise"))
      .orderBy("doc_id")
  }

  /** Contiguous global row ids 0..n-1 in `orderCol` order — the stable
    * example-id assignment a training pipeline needs before sharding.
    * The tempting one-liner — `row_number() OVER (ORDER BY ...)` with no
    * partition key — is a scale-killer: Spark plans a global-order window
    * as a SINGLE partition holding the entire table. This is the
    * two-phase design instead: range-repartition by `orderCol` (sampled
    * boundaries, fully parallel), sort within partitions, then offset
    * each partition's local indexes by the total size of the partitions
    * before it — `zipWithIndex` runs exactly that lightweight per-
    * partition count job (#partitions longs to the driver, never rows).
    * Ids equal the single-partition answer — the oracle IS row_number()
    * — but no stage ever gathers the data.
    *
    * Contract: `orderCol` values must be unique (they key the order;
    * ties would make ids nondeterministic in ANY engine). Range
    * boundaries move with sampling, but that only shifts partition
    * SPLITS, never the global order, so ids reproduce run to run. */
  def assignContiguousIds(df: DataFrame, orderCol: String,
                          numPartitions: Option[Int] = None): DataFrame = {
    // no-arg form is advisory: AQE right-sizes the shuffle (tiny input →
    // few partitions); pass numPartitions to pin the fan-out explicitly
    val parted = numPartitions
      .map(n => df.repartitionByRange(n, col(orderCol)))
      .getOrElse(df.repartitionByRange(col(orderCol)))
    val sorted = parted.sortWithinPartitions(orderCol)
    val schema = sorted.schema.add("gid", org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** QP-IDS — [[assignContiguousIds]] over documents ordered by doc_id. */
  def qpAssignIds(spark: SparkSession, d: String): DataFrame =
    assignContiguousIds(T.documents(spark, d).select("doc_id", "source"), "doc_id")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qp_assign_ids" -> qpAssignIds _,
    "qt_bigram_surprise" -> qtBigramSurprise _,
    "qt_tfidf" -> qtTfidf _,
    "qt_bm25" -> qtBm25 _,
    "qt_bm25_multi" -> qtBm25Multi _,
    "qp_length_buckets" -> qpLengthBuckets _,
    "qt_repetition" -> qtRepetition _,
    "qt_contamination" -> qtContamination _,
    "qp_mixture" -> qpMixture _,
    "qp_sample" -> ((s: SparkSession, d: String) => qpSample(s, d)),
    "qp_source_cap" -> qpSourceCap _,
    "qp_weighted_sample" -> ((s: SparkSession, d: String) => qpWeightedSample(s, d)),
    "qp_chunk" -> ((s: SparkSession, d: String) => qpChunk(s, d)),
    "qp_pack" -> qpPack _,
    "qp_prep_pipeline" -> qpPrepPipeline _,
    "qj_json_props" -> qjJsonProps _,
    "qt_token_stats" -> qtTokenStats _,
    "qt_quality" -> qtQuality _,
    "qt_langid" -> qtLangId _,
    "qt_fingerprint" -> qtFingerprint _,
    "qt_scrub" -> qtScrub _,
    "qt_vocab" -> qtVocab _,
    "qt_split" -> qtSplit _,
    "qt_normalize" -> qtNormalize _,
    "qt_pmi" -> qtPmi _,
    "qt_entropy" -> qtEntropy _,
    "qt_group_split" -> qtGroupSplit _)

  val oracles: Map[String, String] = Map(
    // the oracle is the very single-partition plan the operator avoids —
    // identical ids, different physics
    "qp_assign_ids" ->
      ("SELECT doc_id, source, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS gid " +
        "FROM documents ORDER BY doc_id"),
    // same integer ppm-uniqueness score (`//` ≡ Spark's `div`), same
    // rank-and-cap, same two-leg funnel — DuckDB's ROW_NUMBER mirrors
    // the WindowGroupLimit leg exactly
    "qp_source_cap" ->
      ("WITH s AS (SELECT source, doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(list_distinct(string_split(text, ' '))) * 1000000 " +
        "// len(string_split(text, ' ')) AS BIGINT) AS score FROM documents), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source " +
        "ORDER BY score DESC, doc_id) AS rn FROM s), " +
        "kept AS (SELECT source, COUNT(*) AS docs_kept, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars_kept, " +
        "CAST(MIN(score) AS BIGINT) AS min_kept_score FROM r WHERE rn <= 15 GROUP BY source), " +
        "a AS (SELECT source, COUNT(*) AS docs_in, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars_in FROM s GROUP BY source) " +
        "SELECT a.source, docs_in, docs_kept, chars_in, chars_kept, min_kept_score " +
        "FROM a JOIN kept USING (source) ORDER BY source"),
    // same bigram slicing (1-based list slice ≡ word_shingles for docs
    // of ≥2 tokens), same add-one smoothing, same exact-decimal
    // summation; ln is IEEE-identical on identical doubles and round(4)
    // sits far above any ULP divergence
    "qt_bigram_surprise" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), " +
        "b0 AS (SELECT doc_id, l, unnest(range(1, len(l)))::BIGINT AS i FROM d " +
        "WHERE len(l) >= 2), " +
        "bi AS (SELECT doc_id, array_to_string(l[i : i+1], ' ') AS bg FROM b0), " +
        "c2 AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg), " +
        "c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1 FROM bi GROUP BY 1), " +
        "v AS (SELECT COUNT(DISTINCT w) AS vocab FROM " +
        "(SELECT unnest(l) AS w FROM d)) " +
        "SELECT doc_id, COUNT(*) AS n_bigrams, " +
        "ROUND(CAST(SUM(CAST(-ln((c2 + 1.0) / (c1 + vocab)) AS DECIMAL(28,12))) AS DOUBLE) " +
        "/ COUNT(*), 4) AS avg_surprise " +
        "FROM bi JOIN c2 USING (bg) " +
        "JOIN c1 ON split_part(bg, ' ', 1) = c1.w1 CROSS JOIN v " +
        "GROUP BY doc_id ORDER BY doc_id"),
    // same fixed literal CASE-chain buckets, same integer-exact sums,
    // one double division rounded at the end
    "qp_length_buckets" ->
      ("WITH l AS (SELECT len(string_split(text, ' ')) AS n FROM documents), " +
        "b AS (SELECT LEAST(n, 256) AS len, " +
        "CAST(CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64 " +
        "WHEN n <= 128 THEN 128 ELSE 256 END AS BIGINT) AS bucket_cap FROM l) " +
        "SELECT bucket_cap, COUNT(*) AS docs, " +
        "CAST(SUM(len) AS BIGINT) AS tokens, " +
        "CAST(COUNT(*) * bucket_cap - SUM(len) AS BIGINT) AS padded, " +
        "ROUND(CAST(COUNT(*) * bucket_cap - SUM(len) AS DOUBLE) / " +
        "(COUNT(*) * bucket_cap), 6) AS waste " +
        "FROM b GROUP BY bucket_cap ORDER BY bucket_cap"),
    // same integer stats (tf/df/dl/N), same double expression with k1+1
    // as the literal 2.2, same fixed term order, ranked on the ROUNDED
    // score with a doc_id tiebreak
    "qt_bm25" ->
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
        "sc AS (SELECT doc_id, tf0 + tf1 + tf2 AS hits, " +
        "CASE WHEN tf0 > 0 THEN ln(((CAST(n_docs - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END + " +
        "CASE WHEN tf1 > 0 THEN ln(((CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END + " +
        "CASE WHEN tf2 > 0 THEN ln(((CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))) ELSE 0.0 END AS score " +
        "FROM tf JOIN dl USING (doc_id) CROSS JOIN st), " +
        "ranked AS (SELECT doc_id, CAST(hits AS BIGINT) AS hits, ROUND(score, 6) AS bm25, " +
        "ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS rn FROM sc) " +
        "SELECT doc_id, hits, bm25, rn FROM ranked WHERE rn <= 20 ORDER BY rn"),
    "qt_bm25_multi" ->
      ("WITH q AS (SELECT CAST(query_id AS BIGINT) AS query_id, term " +
        "FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'scan'), " +
        "(2, 'sort'), (2, 'merge'), (2, 'window'), " +
        "(3, 'filter'), (3, 'column'), (3, 'zzzabsent')) AS t(query_id, term)), " +
        "dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents), " +
        "st AS (SELECT COUNT(*) AS n_docs, (SELECT SUM(dl) FROM dl) AS sum_dl FROM documents), " +
        "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "hits AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok " +
        "WHERE token IN (SELECT DISTINCT term FROM q) GROUP BY doc_id, token), " +
        "dft AS (SELECT token, COUNT(*) AS df FROM hits GROUP BY token), " +
        "co AS (SELECT q.query_id, h.doc_id, h.tf, " +
        "CAST(round((ln(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) + 1.0) * " +
        "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * " +
        "(CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))) * 1000000.0, 0) AS BIGINT) AS c " +
        "FROM hits h JOIN q ON h.token = q.term JOIN dft USING (token) " +
        "JOIN dl USING (doc_id) CROSS JOIN st), " +
        "sc AS (SELECT query_id, doc_id, SUM(tf) AS hits, SUM(c) AS c FROM co GROUP BY 1, 2), " +
        "ranked AS (SELECT query_id, doc_id, CAST(hits AS BIGINT) AS hits, " +
        "ROUND(CAST(c AS DOUBLE) / 1000000.0, 6) AS bm25, " +
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, doc_id) AS rn FROM sc) " +
        "SELECT query_id, doc_id, hits, bm25, rn FROM ranked WHERE rn <= 10 " +
        "ORDER BY query_id, rn"),
    "qt_tfidf" ->
      ("WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token " +
        "FROM documents), " +
        "tf AS (SELECT doc_id, token, COUNT(*) AS cnt FROM terms GROUP BY 1, 2), " +
        "dfreq AS (SELECT token, COUNT(*) AS df FROM " +
        "(SELECT DISTINCT doc_id, token FROM terms) GROUP BY token), " +
        "nd AS (SELECT COUNT(*) AS n_docs FROM documents), " +
        "scored AS (SELECT doc_id, tf.token, cnt, " +
        "cnt * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) AS score " +
        "FROM tf JOIN dfreq USING (token) CROSS JOIN nd), " +
        "ranked AS (SELECT doc_id, token, cnt, score, " +
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn " +
        "FROM scored) " +
        "SELECT doc_id, token, cnt AS tf, ROUND(score, 6) AS score, rn " +
        "FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn"),
    "qt_repetition" ->
      ("WITH sh AS (SELECT doc_id, list_transform(range(1, len(string_split(text, ' ')) - 1), " +
        "i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')) AS sh FROM documents) " +
        "SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, " +
        "CAST(len(list_distinct(sh)) AS BIGINT) AS n_uniq, " +
        "ROUND(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 6) AS rep_ratio " +
        "FROM sh ORDER BY doc_id"),
    "qt_contamination" ->
      ("WITH ev AS (SELECT doc_id AS eval_doc, text FROM documents WHERE doc_id % 50 = 0), " +
        "spans AS (SELECT eval_doc, array_to_string(string_split(text, ' ')[1:8], ' ') AS span " +
        "FROM ev), " +
        "tr AS (SELECT d.doc_id AS train_doc, " +
        "CASE WHEN d.doc_id % 7 = 3 THEN d.text || ' ' || s.span ELSE d.text END AS text " +
        "FROM documents d JOIN spans s ON s.eval_doc = (d.doc_id % 10) * 50 " +
        "WHERE d.doc_id % 50 <> 0), " +
        "trs AS (SELECT train_doc, unnest(list_transform(range(1, len(string_split(text, ' ')) - 6), " +
        "i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS sh FROM tr), " +
        "evs AS (SELECT DISTINCT eval_doc, sh FROM " +
        "(SELECT eval_doc, unnest(list_transform(range(1, len(string_split(text, ' ')) - 6), " +
        "i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS sh FROM ev)) " +
        "SELECT t.train_doc, e.eval_doc, COUNT(DISTINCT t.sh) AS shared " +
        "FROM trs t JOIN evs e USING (sh) " +
        "GROUP BY 1, 2 ORDER BY train_doc, eval_doc"),
    "qp_mixture" ->
      ("WITH b AS (SELECT lang, n_chars, substr(md5(lang || ':' || text), 1, 2) AS bucket " +
        "FROM documents), " +
        "k AS (SELECT lang, n_chars, CASE WHEN bucket < " +
        "(CASE WHEN lang = 'en' THEN 'g0' ELSE '33' END) THEN 1 ELSE 0 END AS keep FROM b) " +
        "SELECT lang, COUNT(*) AS docs, CAST(SUM(keep) AS BIGINT) AS kept, " +
        "CAST(SUM(keep * n_chars) AS BIGINT) AS chars_kept " +
        "FROM k GROUP BY lang ORDER BY lang"),
    "qp_sample" ->
      ("SELECT lang, doc_id, rn FROM (" +
        "SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang " +
        "ORDER BY md5('sample:' || doc_id), doc_id) AS rn FROM documents) t " +
        "WHERE rn <= 20 ORDER BY lang, rn"),
    "qt_group_split" ->
      ("WITH a AS (SELECT source, CASE " +
        "WHEN substring(md5(source), 1, 2) < 'cc' THEN 'train' " +
        "WHEN substring(md5(source), 1, 2) < 'e6' THEN 'val' " +
        "ELSE 'test' END AS split, COUNT(*) AS docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1, 2) " +
        "SELECT split, COUNT(*) AS sources, CAST(SUM(docs) AS BIGINT) AS docs, " +
        "CAST(SUM(chars) AS BIGINT) AS chars FROM a GROUP BY split ORDER BY split"),
    "qt_pmi" ->
      ("WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), " +
        "t AS (SELECT unnest(l) AS w FROM d), " +
        "t2 AS (SELECT w FROM t WHERE w <> ''), " +
        "uni AS (SELECT w, COUNT(*) AS c1 FROM t2 GROUP BY w), " +
        "nt AS (SELECT COUNT(*) AS n_tok FROM t2), " +
        "b0 AS (SELECT doc_id, l, unnest(range(1, len(l)))::BIGINT AS i FROM d " +
        "WHERE len(l) >= 2), " +
        "bi AS (SELECT array_to_string(l[i : i+1], ' ') AS bg FROM b0), " +
        "nb AS (SELECT COUNT(*) AS n_bi FROM bi), " +
        "cc AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg HAVING COUNT(*) >= 10), " +
        "j AS (SELECT bg, c2, " +
        "ROUND(ln(CAST(c2 AS DOUBLE) * n_tok * n_tok / (n_bi * a.c1 * b.c1)), 4) AS pmi " +
        "FROM cc JOIN uni a ON split_part(bg, ' ', 1) = a.w " +
        "JOIN uni b ON split_part(bg, ' ', 2) = b.w CROSS JOIN nt CROSS JOIN nb), " +
        "r AS (SELECT bg, c2, pmi FROM j ORDER BY pmi DESC, bg LIMIT 50) " +
        "SELECT bg, c2, pmi FROM r ORDER BY pmi DESC, bg"),
    // same histogram, same c-weighted 1e-9-rounded-BIGINT ln sum
    // (order-free), same expression order for the two divisions
    "qt_entropy" ->
      ("WITH t2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w " +
        "FROM documents), " +
        "h AS (SELECT doc_id, w, COUNT(*) AS c FROM t2 WHERE w <> '' " +
        "GROUP BY doc_id, w), " +
        "a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks, " +
        "COUNT(*) AS n_uniq, CAST(SUM(c * " +
        "CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS s " +
        "FROM h GROUP BY doc_id) " +
        "SELECT doc_id, n_toks, n_uniq, " +
        "ROUND(ln(CAST(n_toks AS DOUBLE)) - CAST(s AS DOUBLE) / 1e9 / n_toks, 4) " +
        "AS entropy, " +
        "CASE WHEN n_uniq > 1 THEN " +
        "ROUND((ln(CAST(n_toks AS DOUBLE)) - CAST(s AS DOUBLE) / 1e9 / n_toks) " +
        "/ ln(CAST(n_uniq AS DOUBLE)), 4) ELSE 0.0 END AS norm_entropy " +
        "FROM a ORDER BY doc_id"),
    "qt_normalize" ->
      ("WITH p AS (SELECT doc_id, text, CASE doc_id % 6 " +
        "WHEN 0 THEN '65CC81' WHEN 1 THEN 'C3A9' WHEN 2 THEN '61CC8A' " +
        "WHEN 3 THEN '6ECC83' WHEN 4 THEN 'EFAC81' ELSE '6F' END AS hx, " +
        // the published NFKC image of each piece: composed forms, the
        // ligature folded to 'fi' — closed-form because DuckDB has no NFKC
        "CASE doc_id % 6 WHEN 0 THEN 'C3A9' WHEN 1 THEN 'C3A9' " +
        "WHEN 2 THEN 'C3A5' WHEN 3 THEN 'C3B1' WHEN 4 THEN '6669' " +
        "ELSE '6F' END AS nfkc_hx FROM documents), " +
        "r AS (SELECT doc_id, " +
        "substring(text, 1, 24) || ' ' || decode(from_hex(hx)) || 'x' AS raw, " +
        "substring(text, 1, 24) || ' ' || decode(from_hex(nfkc_hx)) || 'x' AS nfkc_img " +
        "FROM p) " +
        "SELECT doc_id, CAST(length(raw) AS BIGINT) AS len_raw, " +
        "CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc, " +
        "md5(nfc_normalize(raw)) AS nfc_md5, md5(nfkc_img) AS nfkc_md5, " +
        "strip_accents(raw) AS stripped FROM r ORDER BY doc_id"),
    "qp_weighted_sample" ->
      ("WITH t AS (SELECT lang, doc_id, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS w_toks, " +
        "(((doc_id % 2147483647 * 1103515245 + 12345) % 2147483647 " +
        "* 1103515245 + 12345) % 2147483647 + 1) / 2147483648.0 AS u " +
        "FROM documents), " +
        "r AS (SELECT lang, doc_id, w_toks, ROW_NUMBER() OVER (PARTITION BY lang " +
        "ORDER BY pow(u, 1.0 / w_toks) DESC, doc_id) AS rn FROM t WHERE w_toks > 0) " +
        "SELECT lang, doc_id, w_toks, rn FROM r WHERE rn <= 20 ORDER BY lang, rn"),
    "qp_chunk" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "c AS (SELECT doc_id, toks, " +
        "unnest(range(0, (len(toks) - 1) // 48 + 1)) AS chunk_idx FROM t) " +
        "SELECT doc_id, chunk_idx, " +
        "CAST(len(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS BIGINT) AS n_tok, " +
        "md5(array_to_string(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS fingerprint " +
        "FROM c ORDER BY doc_id, chunk_idx"),
    "qp_pack" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks " +
        "FROM documents), " +
        "c AS (SELECT doc_id, n_toks, SUM(n_toks) OVER " +
        "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t) " +
        "SELECT CAST((cum - n_toks) // 2048 AS BIGINT) AS chunk, COUNT(*) AS docs, " +
        "CAST(SUM(n_toks) AS BIGINT) AS toks, MIN(doc_id) AS first_doc " +
        "FROM c GROUP BY 1 ORDER BY chunk"),
    "qp_prep_pipeline" ->
      ("WITH injected AS (SELECT doc_id, lang, CASE WHEN doc_id % 10 = 0 " +
        "THEN text || ' contact: user' || doc_id || '@example.com' ELSE text END AS raw " +
        "FROM documents), " +
        "cleaned AS (SELECT doc_id, lang, " +
        "regexp_replace(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g') AS clean " +
        "FROM injected), " +
        "gated AS (SELECT * FROM cleaned " +
        "WHERE len(string_split(clean, ' ')) >= 5 " +
        "AND len(list_distinct(string_split(clean, ' '))) * 10 " +
        ">= len(string_split(clean, ' ')) * 3), " +
        "deduped AS (SELECT clean, MIN(doc_id) AS keeper, arg_min(lang, doc_id) AS lang " +
        "FROM gated GROUP BY clean), " +
        "sp AS (SELECT lang, clean, CASE WHEN substr(md5(clean), 1, 2) < 'cc' THEN 'train' " +
        "WHEN substr(md5(clean), 1, 2) < 'e6' THEN 'val' ELSE 'test' END AS split " +
        "FROM deduped) " +
        "SELECT lang, split, COUNT(*) AS docs, CAST(SUM(length(clean)) AS BIGINT) AS chars " +
        "FROM sp GROUP BY lang, split ORDER BY lang, split"),
    "qj_json_props" ->
      // `//` (integer division): DuckDB CAST(9.9 AS INT) rounds where Spark's
      // cast truncates, so avoid the double division entirely.
      ("SELECT (CAST(json_extract_string(props, '$.k') AS INT) // 10) AS k_bucket, " +
        "COUNT(*) AS c, COUNT(DISTINCT user_id) AS users " +
        "FROM events GROUP BY 1 ORDER BY k_bucket"),
    "qt_token_stats" ->
      ("SELECT lang, COUNT(*) AS docs, " +
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_total, " +
        "CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS ws_max, " +
        "CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS bpe_total " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "qt_quality" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks, " +
        "ROUND(CAST(len(list_filter(string_split(text, ' '), " +
        "w -> w IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS stop_ratio, " +
        "ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) " +
        "/ len(string_split(text, ' ')), 6) AS uniq_ratio " +
        "FROM documents ORDER BY doc_id"),
    "qt_langid" ->
      ("WITH scored AS (SELECT lang, " +
        "CAST((length(text) - length(replace(text, 'th', ''))) / 2 " +
        " + (length(text) - length(replace(text, 'er', ''))) / 2 " +
        " + (length(text) - length(replace(text, 'the ', ''))) / 4 AS BIGINT) AS s_en, " +
        "CAST((length(text) - length(replace(text, 'de ', ''))) / 3 " +
        " + (length(text) - length(replace(text, 'la ', ''))) / 3 " +
        " + (length(text) - length(replace(text, 'el ', ''))) / 3 AS BIGINT) AS s_ro " +
        "FROM documents) " +
        "SELECT lang, CASE WHEN s_en >= s_ro * 2 THEN 'en' " +
        "WHEN s_ro > s_en THEN 'romance' ELSE 'unknown' END AS pred, COUNT(*) AS c " +
        "FROM scored GROUP BY 1, 2 ORDER BY lang, pred"),
    "qt_fingerprint" ->
      ("SELECT doc_id, list_min(list_transform(range(1, len(string_split(text, ' ')) - 2), " +
        "i -> md5(array_to_string(string_split(text, ' ')[i:i+3], ' ')))) AS fp " +
        "FROM documents ORDER BY doc_id"),
    "qt_scrub" ->
      ("WITH injected AS (SELECT lang, CASE WHEN doc_id % 10 = 0 " +
        "THEN text || ' contact: user' || doc_id || '@example.com' ELSE text END AS raw " +
        "FROM documents), " +
        "scrubbed AS (SELECT lang, raw, " +
        "regexp_replace(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g') AS clean " +
        "FROM injected) " +
        "SELECT lang, COUNT(*) AS docs, " +
        "CAST(SUM(CASE WHEN raw <> clean THEN 1 ELSE 0 END) AS BIGINT) AS scrubbed_docs, " +
        "CAST(SUM(length(raw) - length(clean)) AS BIGINT) AS chars_removed " +
        "FROM scrubbed GROUP BY lang ORDER BY lang"),
    "qt_vocab" ->
      ("SELECT token, COUNT(*) AS cnt FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) " +
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 20"),
    "qt_split" ->
      ("WITH b AS (SELECT substr(md5(text), 1, 2) AS bucket, n_chars FROM documents) " +
        "SELECT CASE WHEN bucket < 'cc' THEN 'train' WHEN bucket < 'e6' THEN 'val' " +
        "ELSE 'test' END AS split, COUNT(*) AS docs, " +
        "CAST(SUM(n_chars) AS BIGINT) AS chars " +
        "FROM b GROUP BY 1 ORDER BY split"))
}
