package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark plan builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle
  * on the same parquet tables. `oracle = None` → driver records a weaker
  * rows-only check (reserved for ops not expressible in portable SQL).
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryModule {
  /** Ordered (name -> query) definitions contributed by this module. */
  def defs: Seq[(String, Q)]
}
