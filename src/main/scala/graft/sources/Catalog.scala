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

  // last directory registered per session: re-registering the same dir is
  // a pure no-op (views already point there), so the six pure-SQL query
  // builders that call registerAll per build stop paying 10 footer reads
  // each; a DIFFERENT dir still re-registers (and a session whose views
  // were overwritten in between re-registers on its next dir change)
  private val lastDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register all tables from a scale-factor directory as temp views.
    * Events need the ns-as-long read config (see
    * [[graft.queries.Tables.events]]).
    *
    * The same-dir memo is guarded by a catalog probe: if any of the ten
    * views was dropped since, the set re-registers instead of the next
    * query failing with "table not found" on a supposedly-cached catalog.
    * The probe is ten in-memory catalog lookups — far cheaper than the
    * ten parquet footer reads it saves. A view REPLACED by another caller
    * (pointing somewhere else under the same name) is indistinguishable
    * from ours by name alone; pass `force = true` to reclaim the names
    * unconditionally.
    */
  def registerAll(spark: SparkSession, dir: String,
      force: Boolean = false): Unit = {
    val memoHit = !force && lastDir.get(spark) == dir &&
      TableNames.forall(spark.catalog.tableExists)
    if (!memoHit) {
      TableNames.foreach { name =>
        load(spark, dir, name).createOrReplaceTempView(name)
      }
      lastDir.put(spark, dir)
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.queries.Tables.events(spark, dir)
    // one path-construction definition: the SQL-view path and the
    // DataFrame path must read the same files
    else graft.queries.Tables.table(spark, dir, name)
}
