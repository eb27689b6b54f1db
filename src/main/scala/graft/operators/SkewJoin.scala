package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salted equi-join for skewed keys — the manual scale tool for when AQE's
  * skew-join splitting isn't available (e.g. a non-shuffle-join forced by
  * hints) or a single hot key still exceeds a task's memory after AQE
  * splitting.
  *
  * Mechanics: the skewed (large, hot-keyed) side gets a random salt in
  * [0, buckets); the other side is replicated `buckets` times with every
  * salt value; the join key becomes (key, salt), spreading each hot key
  * over `buckets` shuffle partitions. Result is row-identical to the
  * unsalted join (verified in SkewJoinSpec). Cost: `buckets`× replication
  * of the right side — use only when the right side is small relative to
  * the skew being fixed, and prefer AQE skew handling when it applies.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the left side salted. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // a business column named __salt would be silently overwritten by the
    // synthetic salt and then dropped from the output — refuse loudly
    // instead of corrupting the row-identical-to-plain-join contract
    require(!left.columns.contains("__salt") &&
      !right.columns.contains("__salt"),
      "saltedInnerJoin reserves the column name __salt; rename it first")
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val cond: Column =
      salted(leftKey) === replicated(rightKey) &&
        salted("__salt") === replicated("__salt")
    salted.join(replicated, cond, "inner")
      .drop("__salt")
  }
}
