package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed (`Dataset[T]`) views of the core tables — for pipelines where
  * compile-time field safety matters more than Catalyst's ability to see
  * through lambdas.
  *
  * The tradeoff is real and should be chosen per stage: typed
  * `filter(_.field > x)` is opaque to the optimizer (no pushdown through
  * a lambda), while `filter(col("field") > x)` reaches the parquet
  * reader. Use typed surfaces for complex per-record business logic
  * (where a Column expression would be unreadable), relational columns
  * for everything the optimizer can exploit. The MR surface
  * ([[graft.mr.MapReduce]]) is the fully-typed end of this spectrum.
  */
object TypedTables {

  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: Timestamp,
                   o_orderpriority: String)

  def nations(spark: SparkSession, d: String): Dataset[Nation] = {
    import spark.implicits._
    Tables.nation(spark, d).as[Nation]
  }

  def orders(spark: SparkSession, d: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, d).as[Order]
  }
}
