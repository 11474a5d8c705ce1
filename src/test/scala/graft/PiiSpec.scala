package graft

import org.apache.spark.sql.functions._
import graft.operators.Pii

/** The PII pass, pinned end-to-end: the Luhn validator against a
  * reference implementation (native `luhn_check` vs the hand-rolled
  * checksum), the planted-card validity split, and the completeness of
  * the redaction (no family's pattern survives its own scrub). */
class PiiSpec extends SparkSpec {

  test("luhn_check agrees with the reference checksum on planted valid AND invalid cards") {
    import spark.implicits._
    // plantedCard validity contract: valid iff doc_id % 3 == 0
    val df = Pii.withPlantedPii(
      (0L until 120L).toDF("doc_id").withColumn("text", lit("doc body")))
      .withColumn("card", expr(s"regexp_extract(raw, '${Pii.CardPat.replace("\\", "\\\\")}', 0)"))
      .filter(length(col("card")) === 16)
      .withColumn("spark_valid", expr("luhn_check(card)"))
      .select("doc_id", "card", "spark_valid")
    val rows = df.collect()
    assert(rows.length == 96, "doc_id % 5 != 4 plants a card on 96 of 120 ids")
    rows.foreach { r =>
      val id = r.getLong(0); val card = r.getString(1); val got = r.getBoolean(2)
      assert(got == Pii.luhnRef(card), s"luhn_check disagrees with the reference on $card")
      assert(got == (id % 3 == 0), s"id=$id: planted validity contract broken")
    }
  }

  test("redaction is complete and conditional: no live pattern survives; invalid cards are kept") {
    import spark.implicits._
    val out = Pii.detectAndRedact(
      Pii.withPlantedPii((0L until 90L).toDF("doc_id").withColumn("text", lit("plain words"))),
      "raw")
    def survivors(pat: String) =
      out.filter(expr(s"redacted rlike '${pat.replace("\\", "\\\\")}'")).count()
    assert(survivors(Pii.EmailPat) == 0, "an email survived the scrub")
    assert(survivors(Pii.PhonePat) == 0, "a phone number survived the scrub")
    assert(survivors(Pii.Ipv4Pat) == 0, "an IPv4 survived the scrub")
    // card spans survive EXACTLY when Luhn-invalid (id % 3 != 0, planted on % 5 != 4)
    val withCardLeft = out.filter(expr(s"redacted rlike '${Pii.CardPat.replace("\\", "\\\\")}'"))
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 90L).filter(id => id % 5 != 4 && id % 3 != 0).toSet
    assert(withCardLeft == expected,
      "exactly the Luhn-invalid planted cards must remain (a valid checksum is what makes a digit run PII)")
    // and the redaction markers actually landed
    assert(out.filter(col("redacted").contains("[CARD]")).count() ==
      (0L until 90L).count(id => id % 5 != 4 && id % 3 == 0))
    assert(out.filter(col("redacted").contains("[EMAIL]")).count() ==
      (0L until 90L).count(_ % 4 == 0))
  }

  test("the report counts mirror the planting and the pass stays scan-side (no shuffle before the sort)") {
    val rep = graft.operators.Pii.qtPiiReport(spark, sfTiny)
    val plan = rep.queryExecution.executedPlan.toString
    // one Exchange at most (the final orderBy's range partitioning)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"PII pass must be scan-side; plan has $exchanges exchanges:\n$plan")
    val rows = rep.collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 4 == 0) 1L else 0L), s"id=$id n_email")
      assert(r.getLong(2) == (if (id % 3 == 0) 1L else 0L), s"id=$id n_phone")
      assert(r.getLong(3) == (if (id % 2 == 0) 1L else 0L), s"id=$id n_ip")
      assert(r.getLong(4) == (if (id % 5 != 4 && id % 3 == 0) 1L else 0L), s"id=$id n_card_valid")
      assert(r.getLong(5) == (if (id % 5 != 4 && id % 3 != 0) 1L else 0L), s"id=$id n_card_invalid")
    }
  }
}
