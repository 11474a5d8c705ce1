package graft

import org.scalatest.funsuite.AnyFunSuite

class RecursiveProbe extends AnyFunSuite {
  test("probe: WITH RECURSIVE support") {
    val spark = SharedSpark.spark
    val out = spark.sql(
      "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5) " +
        "SELECT SUM(n) AS s FROM r").collect()
    assert(out.head.getLong(0) == 15L)
  }
}
