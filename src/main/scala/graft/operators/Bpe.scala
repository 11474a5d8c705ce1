package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Tables => T}

/** Distributed BPE vocabulary learning — tokenizer training as a
  * Spark program (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units" — public knowledge).
  *
  * Classic BPE trains on the word-frequency table, not the corpus:
  * count adjacent symbol pairs weighted by word frequency, merge the
  * most frequent pair everywhere, repeat. That structure is exactly
  * what makes it scale — the ONLY corpus-sized pass is the word count
  * (one map-side-combine aggregate); every iteration after that runs
  * on the vocabulary, which is orders of magnitude smaller than the
  * corpus at any SF (and at 100 TB the ratio only improves: Heaps' law
  * vocabulary growth is sublinear in corpus size).
  *
  * Two design points keep it engine-portable and collect-free:
  *
  *  - **Merges are plain string `replace`, not array folds.** Words are
  *    represented with DOUBLED-space separators (`"␣␣l␣␣o␣␣w␣␣"`); the
  *    pattern `"␣x␣␣y␣"` can then only match a whole adjacent symbol
  *    pair (symbols contain no spaces, and a longer symbol breaks the
  *    leading-space requirement), while consuming only ONE space of
  *    each boundary pair — so left-to-right non-overlapping `replace`
  *    (the semantics both Spark and DuckDB give) implements BPE's
  *    left-to-right merge INCLUDING back-to-back occurrences
  *    (`x y x y` → `xy xy`) and the overlap rule (`y y y` → `yy y`),
  *    and the replacement `"␣xy␣"` restores the doubled-space
  *    invariant. No higher-order-function fold whose accumulator
  *    semantics DuckDB can't mirror.
  *  - **Best-pair selection never touches the driver.** `orderBy +
  *    limit(1)` plans as TakeOrderedAndProject (per-partition heaps),
  *    and the winning row flows into the next iteration as a broadcast
  *    cross join — the qg_pagerank discipline.
  *
  * A fixed `steps` pins the plan shape the way qg_pagerank's 3
  * iterations do; a production trainer doing ~30k merges would add
  * incremental pair-count deltas per merge instead of recounting
  * (Sennrich's own optimization), which changes the constant, not the
  * distribution strategy. Lineage grows linearly in `steps` and each
  * step's input is vocabulary-sized, so no per-round cuts are needed
  * at this depth (the `require` bounds it).
  */
object Bpe {

  /** Learn `steps` BPE merges from the corpus word-frequency table.
    * Returns one row per merge step: (step, p1, p2, new_sym, cnt) —
    * the merged pair, its concatenation, and its weighted count at
    * selection time. Ties break lexicographically on the pair. */
  def learnMerges(docs: DataFrame, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps out of range: $steps")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit("  "), regexp_replace(col("w"), "(.)", "$1  ")).as("r"),
        col("freq"))
    var cur = words
    var merges = Vector.empty[DataFrame]
    for (step <- 1 to steps) {
      val pairs = cur
        .select(expr("trim(replace(r, '  ', ' '))").as("s"), col("freq"))
        .filter(size(split(col("s"), " ")) >= 2)
        .select(explode(call_function("word_shingles", col("s"), lit(2))).as("bg"),
          col("freq"))
        .groupBy("bg").agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("bg")).limit(1)
      merges = merges :+ best.select(lit(step).as("step"),
        substring_index(col("bg"), " ", 1).as("p1"),
        substring_index(col("bg"), " ", -1).as("p2"),
        expr("replace(bg, ' ', '')").as("new_sym"),
        col("cnt"))
      cur = cur.crossJoin(broadcast(best))
        .select(expr(
          "replace(r, ' ' || substring_index(bg, ' ', 1) || '  ' || " +
            "substring_index(bg, ' ', -1) || ' ', " +
            "' ' || replace(bg, ' ', '') || ' ')").as("r"),
          col("freq"))
    }
    merges.reduce(_ unionByName _).orderBy("step")
  }

  /** QT10 — [[learnMerges]] over `documents`, 3 steps. */
  def qtBpeMerges(spark: SparkSession, d: String): DataFrame =
    learnMerges(T.documents(spark, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qt_bpe_merges" -> qtBpeMerges _)

  /** One unrolled iteration: pair extraction (the qt_pmi slice idiom),
    * weighted counts, deterministic best, and — unless this is the
    * last step — the merged word table for the next iteration. */
  private def iter(i: Int, last: Boolean): String =
    s"l$i AS (SELECT string_split(trim(replace(r, '  ', ' ')), ' ') AS l, freq " +
      s"FROM w${i - 1}), " +
      s"b$i AS (SELECT l, freq, unnest(range(1, len(l)))::BIGINT AS i FROM l$i " +
      s"WHERE len(l) >= 2), " +
      s"pc$i AS (SELECT array_to_string(l[i : i+1], ' ') AS bg, " +
      s"CAST(SUM(freq) AS BIGINT) AS cnt FROM b$i GROUP BY bg), " +
      s"best$i AS (SELECT bg, cnt FROM pc$i ORDER BY cnt DESC, bg LIMIT 1)" +
      (if (last) " " else
        s", w$i AS (SELECT replace(r, ' ' || split_part(bg, ' ', 1) || '  ' || " +
          s"split_part(bg, ' ', 2) || ' ', ' ' || replace(bg, ' ', '') || ' ') AS r, " +
          s"freq FROM w${i - 1} CROSS JOIN best$i), ")

  private def sel(i: Int): String =
    s"SELECT $i AS step, split_part(bg, ' ', 1) AS p1, " +
      s"split_part(bg, ' ', 2) AS p2, replace(bg, ' ', '') AS new_sym, cnt " +
      s"FROM best$i"

  val oracles: Map[String, String] = Map(
    // same word-frequency table, same doubled-space representation,
    // same replace-based merge, 3 iterations unrolled as CTEs (the
    // qg_pagerank device); ties break identically on (cnt DESC, bg)
    "qt_bpe_merges" ->
      ("WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), " +
        "wf AS (SELECT w, COUNT(*) AS freq FROM tok WHERE w <> '' GROUP BY w), " +
        "w0 AS (SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS r, freq FROM wf), " +
        iter(1, last = false) + iter(2, last = false) + iter(3, last = true) +
        sel(1) + " UNION ALL " + sel(2) + " UNION ALL " + sel(3) +
        " ORDER BY step"))
}
