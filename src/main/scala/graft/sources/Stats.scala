package graft.sources

import org.apache.spark.sql.SparkSession

/** Table/column statistics for cost-based optimization.
  *
  * Temp views over parquet paths carry only a file-size estimate — no row
  * counts, no column histograms — so Catalyst's cost-based features
  * (join reorder, stats-driven broadcast decisions beyond file size) are
  * inert on them, and an ad-hoc SQL user inherits syntactic join order.
  * `ANALYZE TABLE` needs a CATALOG table, so [[analyzeAll]] registers
  * each parquet directory as an external datasource table (`g_<name>` by
  * default — the in-memory catalog supports this without a Hive
  * metastore) and computes full column statistics. With
  * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled` set,
  * multi-way inner joins over the `g_` tables are then re-ordered by
  * estimated cost (PlanGuardSpec pins an example), matching how a
  * production deployment would run `ANALYZE TABLE` after each load.
  *
  * On a 100 TB warehouse the ANALYZE scan is itself a big job — run it
  * once per table load, not per query; statistics persist in the
  * metastore. The declared query pack does not depend on this (its join
  * orders are hand-tuned and AQE re-plans at runtime); stats serve the
  * ad-hoc SQL surface.
  *
  * Note: `g_events` exposes the RAW parquet schema, so its `ts` column
  * carries whatever timestamp flavor the file was written with (the
  * `events` temp view normalizes to instant µs timestamps; ANALYZE
  * works either way).
  */
object Stats {

  /** Register `tables` as external catalog tables over `sfDir` and
    * compute row + column statistics; returns the catalog table names.
    * `sfDir` and the table identifiers are caller-supplied strings
    * interpolated into SQL, so both are escaped — a directory (or
    * prefix) containing a quote must not break or redirect the
    * statement. */
  def analyzeAll(spark: SparkSession, sfDir: String,
                 tables: Seq[String] = Tables.all,
                 prefix: String = "g_"): Seq[String] =
    tables.map { n =>
      val t = s"$prefix$n"
      val tq = "`" + t.replace("`", "``") + "`"
      val loc = s"$sfDir/$n.parquet".replace("'", "''")
      spark.sql(s"DROP TABLE IF EXISTS $tq")
      spark.sql(s"CREATE TABLE $tq USING parquet LOCATION '$loc'")
      spark.sql(s"ANALYZE TABLE $tq COMPUTE STATISTICS FOR ALL COLUMNS")
      t
    }
}
