package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-managed tables — reference D1/D2 (SURVEY.md §2.13).
  *
  * The reference issues `CREATE SCHEMA IF NOT EXISTS raw_data /
  * production` (ingest.py:28, transform.py:85) and drop-and-recreates
  * tables inside those schemas. The Spark-native equivalent is a
  * catalog database plus `saveAsTable`: the table becomes addressable
  * by name (`spark.table("production.movie_facts")`, `spark.sql`),
  * schema tracked by the catalog, storage still parquet under the
  * warehouse dir — so downstream SQL users get the same two-level
  * namespace the reference's Postgres consumers see.
  */
object CatalogTables {

  /** D1: `CREATE SCHEMA IF NOT EXISTS` — idempotent, like the reference. */
  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** D2: full-replace a catalog table (drop + recreate from the frame's
    * schema, subsuming the reference's get_schema/DROP/CREATE/COPY).
    */
  def replaceTable(df: DataFrame, db: String, table: String): Unit = {
    ensureDatabase(df.sparkSession, db)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(s"`$db`.`$table`")
  }

  def read(spark: SparkSession, db: String, table: String): DataFrame =
    spark.table(s"`$db`.`$table`")
}

/** Warehouse backend over catalog tables: the pipeline's production
  * sinks become `production.movie_facts` etc. instead of bare paths.
  */
final class CatalogWarehouse(db: String) extends Warehouse {
  override def read(spark: SparkSession, table: String): DataFrame =
    CatalogTables.read(spark, db, table)

  override def write(df: DataFrame, table: String): Unit =
    CatalogTables.replaceTable(df, db, table)
}
