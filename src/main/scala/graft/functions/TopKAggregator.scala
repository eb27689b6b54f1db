package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Exact top-k values per group as a typed [[Aggregator]] — the custom
  * aggregation seam (user-defined aggregate functions) of the engine.
  * The buffer holds at most k elements, so partial aggregation ships k
  * doubles per group per partition regardless of group size — the
  * map-side-combine shape that keeps exact top-k cheap at scale (contrast
  * with collect_list + sort, whose buffers grow with group size).
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0)

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.size < k) (buf :+ v).sortBy(-_)
    else if (v > buf.last) (buf.init :+ v).sortBy(-_)
    else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sortBy(-_).take(k)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** k smallest long values per group, ascending — same bounded-buffer
  * map-side-combine shape as [[TopKDoubles]]. Used for posting-list heads
  * in the inverted index: a stopword's group has ~|corpus| members, but
  * every partial buffer ships at most k longs, so hot terms cost the same
  * shuffle bytes as rare ones (contrast collect_set + sort, whose partial
  * state is the full distinct set — O(df) on the hottest key).
  */
class BottomKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.size < k) (buf :+ v).sorted
    else if (v < buf.last) (buf.init :+ v).sorted
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped-DataFrame form: `df.groupBy(...).agg(top_k(3)($"x"))`. */
  def top_k(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new TopKDoubles(k), ExpressionEncoder[Double]())

  /** SQL registration: `SELECT <name>(x) … GROUP BY …` — the UDAF made
    * available to pure-SQL users alongside the scalar registrations in
    * [[graft.functions.VectorFunctions.register]].
    */
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
      k: Int): Unit =
    spark.udf.register(name, top_k(k))
}
