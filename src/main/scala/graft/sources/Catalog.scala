package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source catalog: registers every harness table as a temp view so pure-SQL
  * users (the reference's audience — `ctx.sql(...)` over registered tables,
  * `/root/reference/examples/adhesive.rs:19`) can query by name.
  */
object Catalog {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables from a scale-factor directory as temp views.
    * Events need the ns-as-long read config (see
    * [[graft.queries.Tables.events]]).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach { name =>
      load(spark, dir, name).createOrReplaceTempView(name)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.queries.Tables.events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
}
