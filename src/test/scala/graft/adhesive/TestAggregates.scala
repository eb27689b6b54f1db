package graft.adhesive

/** Shared dynamic-aggregate DDL bodies used by both the correctness spec
  * ([[AggregateDdlSpec]]) and the shuffle-volume study
  * ([[AggShuffleStudyR12]]) — one source of truth for the fold, so a fix
  * to its semantics (e.g. length-mismatch behavior of `add`) cannot
  * silently diverge between the two.
  */
object TestAggregates {

  /** `CREATE AGGREGATE FUNCTION <name>(ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>`
    * — element-wise vector sum; state and result are java.util.List, the
    * same container the argument side's `row.getList` hands out.
    */
  def vectorSumDdl(name: String): String =
    s"""CREATE OR REPLACE AGGREGATE FUNCTION $name(ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> LANGUAGE JAVA AS '
       |import graft.adhesive.AdhesiveAggregate;
       |import org.apache.spark.sql.Row;
       |import java.util.ArrayList;
       |import java.util.List;
       |public class VSum extends AdhesiveAggregate {
       |  public Object zero() { return new ArrayList<Double>(); }
       |  private static List<Double> add(List<Double> a, List<Double> b) {
       |    if (a.isEmpty()) return new ArrayList<>(b);
       |    List<Double> out = new ArrayList<>(a);
       |    for (int i = 0; i < b.size(); i++) out.set(i, out.get(i) + b.get(i));
       |    return out;
       |  }
       |  @SuppressWarnings("unchecked")
       |  public Object reduce(Object state, Row input) {
       |    if (input.isNullAt(0)) return state;
       |    return add((List<Double>) state, input.getList(0));
       |  }
       |  @SuppressWarnings("unchecked")
       |  public Object merge(Object a, Object b) {
       |    return add((List<Double>) a, (List<Double>) b);
       |  }
       |}
       |'""".stripMargin
}
