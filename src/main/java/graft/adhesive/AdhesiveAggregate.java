package graft.adhesive;

import org.apache.spark.sql.Row;

/**
 * Base class for dynamically-registered AGGREGATE functions — the variant
 * the reference never closed ({@code RegisterFunction::Scalar} is its only
 * enum case, {@code /root/reference/src/fusion.rs:78}). A user supplies a
 * subclass via {@code CREATE AGGREGATE FUNCTION ... LANGUAGE JAVA AS
 * '<source>'} (or {@code LANGUAGE CLASS}/{@code SCALA}) and implements the
 * four classic distributed-aggregation callbacks; the engine runs them
 * through Spark's typed {@code Aggregator} machinery, which means
 * <b>map-side partial aggregation for free</b>: {@code reduce} runs locally
 * per partition and only the small per-partition states cross the shuffle,
 * where {@code merge} combines them — the shape that scales to 100 TB.
 *
 * <p>Contract:
 * <ul>
 *   <li><b>{@code zero()}</b> — the identity state. Must be non-null and a
 *       value of the declared {@code STATE} type (which defaults to the
 *       {@code RETURNS} type when omitted).</li>
 *   <li><b>{@code reduce(state, input)}</b> — fold one input row into the
 *       state and return the new state. Arguments are read positionally from
 *       {@code input}, exactly like {@link Adhesive#compute}.</li>
 *   <li><b>{@code merge(a, b)}</b> — combine two partial states (across
 *       partitions / shuffle). Must be commutative and associative, and
 *       treat {@code zero()} as the identity — Spark chooses the merge tree
 *       freely.</li>
 *   <li><b>{@code finish(state)}</b> — map the final state to the declared
 *       {@code RETURNS} type; defaults to the identity. May return
 *       {@code null} (a null result slot for an empty-or-filtered
 *       group).</li>
 *   <li><b>One instance per JVM</b>, created via the no-arg constructor and
 *       shared across tasks — state must flow through the callback
 *       arguments, never through instance fields.</li>
 * </ul>
 */
public abstract class AdhesiveAggregate implements java.io.Serializable {

    /** The identity state (non-null, of the declared STATE type). */
    public abstract Object zero();

    /** Fold one input row into the state; return the new state. */
    public abstract Object reduce(Object state, Row input);

    /** Combine two partial states; commutative and associative. */
    public abstract Object merge(Object a, Object b);

    /** Map the final state to the result; identity by default. */
    public Object finish(Object state) {
        return state;
    }
}
