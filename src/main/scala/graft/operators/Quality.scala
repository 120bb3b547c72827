package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-quality checks — parity with the reference's dbt generic tests
  * (`unique`, `not_null`, `relationships`, `accepted_values`; declared in
  * dbt/dbt_duckdb/models/ecom_staging/schema.yml:3-222 etc.), with
  * store_failures behavior (dbt_project.yml:41-43): every check returns
  * the FAILING rows as a DataFrame — empty means pass.
  *
  * Each check is a single aggregation or join — no collect; the result can
  * be counted (gate) or persisted (audit) at any scale.
  */
object Quality {

  /** Rows whose key (combination) appears more than once. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows with a NULL in the column. */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** dbt `relationships`: child values with no matching parent key.
    * NULL child keys are not violations (dbt semantics). */
  def relationship(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** dbt `accepted_values`. */
  def acceptedValues(df: DataFrame, c: String, values: Seq[Any]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  final case class CheckResult(name: String, failures: Long)

  /** Run named checks; persist failing rows under `failuresPath/<name>`
    * (store_failures parity) when a path is given. */
  def run(checks: Seq[(String, DataFrame)],
      failuresPath: Option[String] = None): Seq[CheckResult] =
    checks.map { case (name, failing) =>
      val n = failing.count()
      if (n > 0) failuresPath.foreach { p =>
        failing.write.mode(SaveMode.Overwrite).parquet(s"$p/$name")
      }
      CheckResult(name, n)
    }
}
