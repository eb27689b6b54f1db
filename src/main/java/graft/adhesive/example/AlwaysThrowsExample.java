package graft.adhesive.example;

import graft.adhesive.Adhesive;
import org.apache.spark.sql.Row;

/**
 * Classpath example function that always throws, used to test that a failing
 * function fails the whole query (error-propagation parity with the
 * reference's exception fixture,
 * {@code /root/reference/java/src/main/java/.../example/FreaksOutExample.java:10-12},
 * asserted at {@code /root/reference/src/jvm.rs:316-330}).
 */
public class AlwaysThrowsExample extends Adhesive {
    @Override
    public Object compute(Row row) {
        throw new RuntimeException("deliberate failure from AlwaysThrowsExample");
    }
}
