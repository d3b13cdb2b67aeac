package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.queries.*` as [[GraftQuery]] values (Spark
  * build function + optional DuckDB oracle SQL); this object just flattens
  * the registry into the maps the driver consumes.
  */
object SparkEntry {

  /** Every implemented operator from SURVEY.md §2, by name. */
  def registry: Seq[GraftQuery] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      EmbeddingQueries.all ++ MLQueries.all ++ PipelineQueries.all ++
      InvariantQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The W1 user-similarity semantics (top-5 TF-IDF cosine neighbors per
    * user) in its scalable relational form. */
  def entry(spark: SparkSession): DataFrame =
    queries("q51_w1_tfidf_relational")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
