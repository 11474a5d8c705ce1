package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime registration of the engine's native expressions, for sessions
  * not built with [[graft.GraftExtensions]] (e.g. an already-running
  * notebook session). Idempotent; operators call it before using the
  * functions by name.
  */
object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!registry.functionExists(new FunctionIdentifier("simhash64"))) {
      registry.registerFunction(
        new FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head))
    }
  }
}
