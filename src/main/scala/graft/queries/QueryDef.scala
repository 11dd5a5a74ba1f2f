package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (optionally) an
  * equivalent ANSI-SQL oracle that the driver runs through DuckDB over the
  * same parquet tables. Column names MUST match between the two; when the
  * oracle is None the driver records a weaker rows-only check.
  */
final case class QueryDef(
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  def apply(impl: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(impl, Some(sql))
}
