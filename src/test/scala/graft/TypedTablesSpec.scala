package graft

import org.apache.spark.sql.functions._
import graft.sources.{Tables, TypedTables}

class TypedTablesSpec extends SparkSpec {
  import spark.implicits._

  test("typed orders pipeline == relational twin") {
    val typed = TypedTables.orders(spark, sfTiny)
      .filter(o => o.o_orderpriority == "1-URGENT" && o.o_totalprice > 100000.0)
      .map(o => (o.o_custkey, o.o_orderkey))
      .collect().toSet
    val relational = Tables.orders(spark, sfTiny)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 100000.0)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)]
      .collect().toSet
    assert(typed == relational && typed.nonEmpty)
  }

  test("typed join with case-class results") {
    val o = TypedTables.orders(spark, sfTiny)
    val n = TypedTables.nations(spark, sfTiny)
    val joined = o.joinWith(n, o("o_custkey") % 25 === n("n_nationkey"))
    val row = joined.head()
    assert(row._1.o_orderkey >= 0 && row._2.n_name.nonEmpty) // keys start at 0
    assert(joined.count() > 0)
  }
}
