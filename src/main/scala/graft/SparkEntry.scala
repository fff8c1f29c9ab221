package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families:
  *  - [[ParityQueries]]  — the reference's operator inventory (SURVEY §2)
  *  - [[JoinQueries]]    — join/agg surface over the star schema
  *  - [[DedupQueries]]   — exact + near-duplicate detection (extensions)
  *  - [[SimQueries]]     — embedding similarity search (extensions)
  *  - [[TextQueries]]    — text analysis (extensions)
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_resample_broadband")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ JoinQueries.queries ++
      DedupQueries.queries ++ SimQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ StatsQueries.queries ++
      RetrievalQueries.queries ++ LayoutQueries.queries ++
      AudioQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ JoinQueries.oracleSql ++
      DedupQueries.oracleSql ++ SimQueries.oracleSql ++ TextQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ StatsQueries.oracleSql ++
      RetrievalQueries.oracleSql ++ LayoutQueries.oracleSql ++
      AudioQueries.oracleSql ++ GraphQueries.oracleSql
}
