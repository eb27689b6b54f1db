package graft.pipeline;

import org.apache.spark.rdd.RDD;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.classic.Dataset;
import org.apache.spark.sql.classic.SparkSession;
import org.apache.spark.sql.types.StructType;

/**
 * Bridge to {@code SparkSession.internalCreateDataFrame(rdd, schema,
 * isStreaming = true)} — the constructor every V1 streaming source
 * (Spark's own FileStreamSource included) uses to hand
 * MicroBatchExecution a batch whose plan carries {@code
 * isStreaming=true} (the engine asserts it on the DataFrame returned
 * by {@code Source.getBatch}). The method is {@code private[sql]} in
 * Scala, which erases to a public method in bytecode; calling it from
 * Java is the same access path compiled Spark code uses, with no
 * reflection and full compile-time signature checking.
 */
public final class StreamingDataFrameShim {
    private StreamingDataFrameShim() {}

    public static Dataset<Row> streamingDataFrame(
            SparkSession spark, RDD<InternalRow> rdd, StructType schema) {
        return spark.internalCreateDataFrame(rdd, schema, true);
    }
}
