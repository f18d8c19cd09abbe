package graft.udf

/** Declared signature of a managed function — the Spark-native form of the
  * reference's `config(params=[...], return_type=...)` blocks
  * (/root/reference/models/udf/function/parse_datetime.sql:1-8,
  *  /root/reference/models/udf/table_function/test_table_function.sql:1-7).
  *
  * Like dbt's `config.require`
  * (/root/reference/macros/udf/get_create_function_as_sql.sql:3-5), missing
  * required pieces fail at registration time, not at first call.
  */
final case class Param(name: String, sqlType: String) {
  require(name.nonEmpty, "param name must be non-empty")
  require(sqlType.nonEmpty, s"param $name: type must be non-empty")
  def ddl: String = s"$name $sqlType"
}

/** A scalar SQL-bodied UDF as a managed catalog object. */
final case class UdfSpec(
    name: String,
    params: Seq[Param],
    returnType: String,
    body: String,
    description: String = ""
) {
  require(name.nonEmpty, "function name must be non-empty")
  require(returnType.nonEmpty, s"function $name: return_type is required")
  require(body.trim.nonEmpty, s"function $name: body is required")
}

/** A SQL-bodied table function (parameterized query, not a row generator —
  * see SURVEY.md §2.3). Output schema is inferred from the body, mirroring
  * BigQuery TVF DDL which has no RETURNS clause
  * (/root/reference/macros/udf/get_create_table_function_as_sql.sql:11).
  */
final case class TvfSpec(
    name: String,
    params: Seq[Param],
    query: String,
    description: String = ""
) {
  require(name.nonEmpty, "table function name must be non-empty")
  require(query.trim.nonEmpty, s"table function $name: query is required")
}

/** Environment-routed namespacing: the same logical UDF lands in `udf`,
  * `udf_dev`, `udf_staging`, or `udf_ci` depending on the deploy target —
  * port of the reference's dataset routing (/root/reference/README.md:181-193).
  */
object EnvRouting {
  val environments: Set[String] = Set("prod", "ci", "staging", "dev")

  def database(base: String, env: String): String = {
    require(environments.contains(env), s"unknown env '$env' (expected one of $environments)")
    if (env == "prod") base else s"${base}_$env"
  }
}
