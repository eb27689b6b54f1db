package graft.adhesive.example;

import graft.adhesive.Adhesive;
import org.apache.spark.sql.Row;

/**
 * Classpath example function used by the {@code LANGUAGE CLASS} path:
 * {@code f(a BIGINT, b BIGINT) RETURNS BIGINT = a + b}. Functional twin of
 * the reference's example class
 * ({@code /root/reference/java/src/main/java/.../example/BasicExample.java:15-17}).
 */
public class BasicAddExample extends Adhesive {
    @Override
    public Object compute(Row row) {
        if (row.isNullAt(0) || row.isNullAt(1)) {
            return null;
        }
        return row.getLong(0) + row.getLong(1);
    }
}
