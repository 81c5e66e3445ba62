package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query over /root/testdata parquet, paired (where SQL-expressible) with a
  * DuckDB oracle on the same tables.
  */
object SparkEntry {

  /** All registered query groups, in build order. */
  def allDefs: Seq[QueryDef] =
    queries_relational ++ queries_text ++ queries_etl ++ queries_streaming ++
      queries_analytics ++ queries_stats ++ queries_jira

  private def queries_relational: Seq[QueryDef] = graft.queries.Relational.defs
  private def queries_text: Seq[QueryDef] =
    graft.queries.TextDedupOps.defs ++ graft.queries.TextSimOps.defs ++
      graft.queries.TextScoreOps.defs ++ graft.queries.TextPrepOps.defs
  private def queries_etl: Seq[QueryDef] = graft.queries.EtlOps.defs
  private def queries_streaming: Seq[QueryDef] = graft.queries.StreamingOps.defs
  private def queries_analytics: Seq[QueryDef] = graft.queries.Analytics.defs
  private def queries_stats: Seq[QueryDef] = graft.queries.StatOps.defs
  private def queries_jira: Seq[QueryDef] = graft.queries.JiraAnalytics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_star_join_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(allDefs.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap(allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }: _*)
}
