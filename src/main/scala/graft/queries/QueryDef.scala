package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked query: the Spark build plus (when expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column aliases MUST match between the two — the driver's compare
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
