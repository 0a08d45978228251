package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{BasketQueries, CorpusQueries, DedupQueries,
  EncodeQueries, GraphQueries, LayoutQueries, LinalgQueries, MLQueries,
  ProfileQueries, RelationalQueries, SampleQueries, SearchQueries,
  SeriesQueries, SimilarityQueries, SketchQueries, SourceQueries,
  StreamTextQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q26 shape: the reference's flagship end-to-end test
    * (/root/reference/test/q26_test.jl:63-88).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q26_shape")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SeriesQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MLQueries.queries ++
      StreamTextQueries.queries ++ SourceQueries.queries ++
      SampleQueries.queries ++ BasketQueries.queries ++
      LinalgQueries.queries ++ SearchQueries.queries ++
      CorpusQueries.queries ++ SketchQueries.queries ++
      LayoutQueries.queries ++ GraphQueries.queries ++
      ProfileQueries.queries ++ EncodeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ SeriesQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MLQueries.oracles ++
      StreamTextQueries.oracles ++ SourceQueries.oracles ++
      SampleQueries.oracles ++ BasketQueries.oracles ++
      LinalgQueries.oracles ++ SearchQueries.oracles ++
      CorpusQueries.oracles ++ SketchQueries.oracles ++
      LayoutQueries.oracles ++ GraphQueries.oracles ++
      ProfileQueries.oracles ++ EncodeQueries.oracles
}
