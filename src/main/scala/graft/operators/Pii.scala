package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Tables => T}

/** PII detection + redaction — the compliance pass every training-data
  * pipeline runs before anything else touches the corpus. Four span
  * families: email, NANP-style phone, IPv4, and 16-digit payment-card
  * numbers with REAL Luhn validation (ISO/IEC 7812 check digit) — a
  * card-shaped span only redacts when its checksum verifies, which is
  * what separates an account number from a random digit run and keeps
  * the scrub's false-positive rate down.
  *
  * Spark-first shape: the whole pass is native codegen'd string work —
  * `regexp_extract_all` for detection, `luhn_check` (Spark ≥3.5 SQL
  * function) inside a higher-order `filter` for validation, and a
  * higher-order `aggregate` fold for the conditional replacement. Zero
  * UDFs, zero shuffles before the final ORDER BY: at 100 TB this is a
  * pure scan-side map pass, exactly like the other text scrubbers
  * (TextAnalysis.qtScrub, reference behavior the email leg extends).
  *
  * The corpus carries no natural PII (verified: all four patterns have
  * zero matches on the raw documents table), so [[withPlantedPii]]
  * injects deterministic spans per doc_id — including cards whose Luhn
  * check digit is correct only for doc_id % 3 == 0, giving the
  * validator real negatives. The DuckDB oracle re-derives everything
  * INDEPENDENTLY: it re-plants the same spans closed-form, re-extracts
  * with the same (RE2/Java-compatible) patterns, and re-implements the
  * Luhn sum in SQL over the extracted strings — so a hash match proves
  * the detector, the validator, and the byte-exact redacted text (md5)
  * all agree cross-engine. */
object Pii {

  // RE2/Java-compatible patterns (char classes + bounded quantifiers +
  // \b only — no lookaround), so Spark and DuckDB match identically.
  val EmailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  val PhonePat = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val CardPat = "\\b[0-9]{16}\\b"

  /** Reference Luhn (for the spec differential): true iff the full
    * digit string's checksum is a multiple of 10. */
  def luhnRef(digits: String): Boolean = {
    var s = 0; var i = 0
    while (i < digits.length) {
      val d = digits.charAt(digits.length - 1 - i) - '0'
      s += (if (i % 2 == 1) { val t = 2 * d; if (t > 9) t - 9 else t } else d)
      i += 1
    }
    s % 10 == 0
  }

  /** Planted 15 payload digits: digit j = (doc_id·(j+3) + j²) mod 10.
    * The 16th digit closes the Luhn sum for doc_id % 3 == 0 and is
    * bumped +1 (mod 10) otherwise — a guaranteed-invalid card. */
  private def plantedCard(id: Column): Column = {
    val payload = (0 until 15).map(j => (id * (j + 3) + lit(j * j)) % 10)
    // payload digit j sits at position 15-j from the right of the full
    // 16-digit number → doubled when j is even
    val luhnSum = payload.zipWithIndex.map { case (d, j) =>
      if (j % 2 == 0) { val t = d * 2; when(t > 9, t - 9).otherwise(t) } else d
    }.reduce(_ + _)
    val check0 = (lit(10) - luhnSum % 10) % 10
    val check = when(id % 3 === 0, check0).otherwise((check0 + 1) % 10)
    concat((payload :+ check).map(_.cast("string")): _*)
  }

  /** Documents with deterministic PII spans appended (pure Column
    * arithmetic — the planting itself is scan-side codegen):
    * email on doc_id % 4 == 0, phone on % 3 == 0, IPv4 on % 2 == 0,
    * card on % 5 != 4 (valid Luhn iff % 3 == 0). */
  def withPlantedPii(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val email = concat(lit(" reach user"), id.cast("string"), lit("@example.com"))
    val phone = concat(lit(" call +1-555-"), (id % 900 + 100).cast("string"),
      lit("-"), (id % 9000 + 1000).cast("string"))
    val ip = concat(lit(" host 10."), (id % 256).cast("string"),
      lit("."), ((id * 7) % 256).cast("string"), lit("."), ((id * 13) % 256).cast("string"))
    val card = concat(lit(" card "), plantedCard(id))
    docs.withColumn("raw", concat(col("text"),
      when(id % 4 === 0, email).otherwise(lit("")),
      when(id % 3 === 0, phone).otherwise(lit("")),
      when(id % 2 === 0, ip).otherwise(lit("")),
      when(id % 5 =!= 4, card).otherwise(lit(""))))
  }

  /** Detect + validate + redact over a text column — the reusable
    * production pass. Adds `emails/phones/ips/cards/valid_cards`
    * (arrays) and `redacted` (emails → phones → IPv4s replaced
    * unconditionally; card spans replaced only when Luhn-valid, via a
    * higher-order fold over the validated spans). */
  def detectAndRedact(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("emails", expr(s"regexp_extract_all($textCol, '${sqlLit(EmailPat)}', 0)"))
      .withColumn("phones", expr(s"regexp_extract_all($textCol, '${sqlLit(PhonePat)}', 0)"))
      .withColumn("ips", expr(s"regexp_extract_all($textCol, '${sqlLit(Ipv4Pat)}', 0)"))
      .withColumn("cards", expr(s"regexp_extract_all($textCol, '${sqlLit(CardPat)}', 0)"))
      .withColumn("valid_cards", expr("filter(cards, c -> luhn_check(c))"))
      .withColumn("redacted", expr(
        s"""aggregate(valid_cards,
           |  regexp_replace(regexp_replace(regexp_replace($textCol,
           |    '${sqlLit(EmailPat)}', '[EMAIL]'),
           |    '${sqlLit(PhonePat)}', '[PHONE]'),
           |    '${sqlLit(Ipv4Pat)}', '[IP]'),
           |  (acc, c) -> replace(acc, c, '[CARD]'))""".stripMargin))

  /** Double the backslashes for embedding a Java regex inside a Spark
    * SQL single-quoted literal (the SQL parser unescapes one level). */
  private def sqlLit(pat: String): String = pat.replace("\\", "\\\\")

  /** QT — per-document PII report: span counts by family, the
    * Luhn-valid/invalid card split, and the redacted text pinned
    * byte-exactly (length + md5). */
  def qtPiiReport(spark: SparkSession, d: String): DataFrame =
    detectAndRedact(withPlantedPii(graft.sources.Tables.fanOut(
      T.documents(spark, d).select("doc_id", "text"))), "raw")
      .select(col("doc_id"),
        size(col("emails")).cast("long").as("n_email"),
        size(col("phones")).cast("long").as("n_phone"),
        size(col("ips")).cast("long").as("n_ip"),
        size(col("valid_cards")).cast("long").as("n_card_valid"),
        (size(col("cards")) - size(col("valid_cards"))).cast("long").as("n_card_invalid"),
        length(col("redacted")).cast("long").as("clean_len"),
        md5(col("redacted")).as("clean_md5"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qt_pii_report" -> qtPiiReport _)

  /** The oracle mirrors the plant closed-form, re-extracts with the
    * same patterns, and re-implements Luhn in SQL over the EXTRACTED
    * strings (independent of the planting formula), then rebuilds the
    * redacted text. MATERIALIZED CTEs per the DuckDB inlining rule. */
  private val piiOracle: String = {
    // planted card digits in SQL (same closed form as plantedCard)
    val payloadDigit = "(media_id*(j+3) + j*j) % 10"
    val luhnSumSql =
      s"list_sum(list_transform(range(15), j -> CASE WHEN j % 2 = 0 THEN " +
        s"(CASE WHEN 2*($payloadDigit) > 9 THEN 2*($payloadDigit) - 9 ELSE 2*($payloadDigit) END) " +
        s"ELSE $payloadDigit END))"
    val cardSql =
      s"array_to_string(list_transform(range(15), j -> CAST($payloadDigit AS VARCHAR)), '') || " +
        s"CAST(((10 - ($luhnSumSql) % 10) % 10 + CASE WHEN media_id % 3 = 0 THEN 0 ELSE 1 END) % 10 AS VARCHAR)"
    // general Luhn over an extracted 16-char string c (substr is 1-based;
    // i counts from the right, odd i doubled)
    val dig = "CAST(substr(c, CAST(16 - i AS INT), 1) AS INT)"
    val luhnCheckSql =
      s"list_sum(list_transform(range(16), i -> CASE WHEN i % 2 = 1 THEN " +
        s"(CASE WHEN 2*$dig > 9 THEN 2*$dig - 9 ELSE 2*$dig END) ELSE $dig END)) % 10 = 0"
    "WITH p AS MATERIALIZED (SELECT doc_id AS media_id, text || " +
      "(CASE WHEN doc_id % 4 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) || " +
      "(CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END) || " +
      "(CASE WHEN doc_id % 2 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id*7) % 256 AS VARCHAR) || '.' || CAST((doc_id*13) % 256 AS VARCHAR) ELSE '' END) || " +
      s"(CASE WHEN doc_id % 5 != 4 THEN ' card ' || $cardSql ELSE '' END) AS raw FROM documents), " +
      "x AS MATERIALIZED (SELECT media_id, raw, " +
      s"regexp_extract_all(raw, '$EmailPat') AS emails, " +
      s"regexp_extract_all(raw, '$PhonePat') AS phones, " +
      s"regexp_extract_all(raw, '$Ipv4Pat') AS ips, " +
      s"regexp_extract_all(raw, '$CardPat') AS cards FROM p), " +
      "v AS MATERIALIZED (SELECT *, " +
      s"list_filter(cards, c -> $luhnCheckSql) AS valid_cards, " +
      s"regexp_replace(regexp_replace(regexp_replace(raw, '$EmailPat', '[EMAIL]', 'g'), " +
      s"'$PhonePat', '[PHONE]', 'g'), '$Ipv4Pat', '[IP]', 'g') AS red3 FROM x) " +
      "SELECT media_id AS doc_id, " +
      "CAST(len(emails) AS BIGINT) AS n_email, CAST(len(phones) AS BIGINT) AS n_phone, " +
      "CAST(len(ips) AS BIGINT) AS n_ip, CAST(len(valid_cards) AS BIGINT) AS n_card_valid, " +
      "CAST(len(cards) - len(valid_cards) AS BIGINT) AS n_card_invalid, " +
      "CAST(length(CASE WHEN len(valid_cards) > 0 THEN replace(red3, valid_cards[1], '[CARD]') ELSE red3 END) AS BIGINT) AS clean_len, " +
      "md5(CASE WHEN len(valid_cards) > 0 THEN replace(red3, valid_cards[1], '[CARD]') ELSE red3 END) AS clean_md5 " +
      "FROM v ORDER BY doc_id"
  }

  val oracles: Map[String, String] = Map("qt_pii_report" -> piiOracle)
}
