package graft;

import java.io.Serializable;
import java.util.Arrays;
import java.util.Collections;
import java.util.List;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.functions;
import scala.Tuple3;

/**
 * Exercises the Java-callable API surface — the {@code java.util.List}
 * overloads and bean-encoded datasets a pure-Java caller uses (the
 * reference certifies the same surface in its DiffJavaTests) — with no
 * test-framework dependency of its own: the JavaApiSuite Scala spec
 * invokes {@link #run} and asserts on the returned summary.
 */
public final class JavaApiParity {

  /** Plain JavaBean (the {@code Encoders.bean} contract). */
  public static class Value implements Serializable {
    private int id;
    private String value;

    public Value() {}

    public Value(int id, String value) {
      this.id = id;
      this.value = value;
    }

    public int getId() { return id; }

    public void setId(int id) { this.id = id; }

    public String getValue() { return value; }

    public void setValue(String value) { this.value = value; }
  }

  private JavaApiParity() {}

  /**
   * Runs diff / diffWith / histogram exactly as a Java caller would.
   * Returns {nDiffRows, nChanged, nDiffWithRows, nWithNullLeft,
   * bucketLe1, bucketLe2, bucketGt2}.
   */
  @SuppressWarnings({"unchecked", "rawtypes"})
  public static long[] run(SparkSession spark) {
    List<Value> leftRows = Arrays.asList(
        new Value(1, "one"), new Value(2, "two"), new Value(3, "three"));
    List<Value> rightRows = Arrays.asList(
        new Value(1, "one"), new Value(2, "Two"), new Value(4, "four"));
    Dataset<Value> left =
        spark.createDataset(leftRows, Encoders.bean(Value.class));
    Dataset<Value> right =
        spark.createDataset(rightRows, Encoders.bean(Value.class));

    List<String> ids = Collections.singletonList("id");
    List<String> ignore = Collections.emptyList();

    // the java.util.List overloads (reference: DiffJavaTests.java)
    Dataset<Row> diff = graft.diff.Diff.of(left, right, ids, ignore);
    long nDiff = diff.count();
    long nChanged = diff.filter("diff = 'C'").count();

    Dataset<Tuple3<String, Value, Value>> diffWith =
        graft.diff.Diff.ofWith(left, right, ids, ignore);
    long nWith = diffWith.count();
    long nWithNullLeft =
        diffWith.filter((org.apache.spark.api.java.function.FilterFunction<
            Tuple3<String, Value, Value>>) t -> t._2() == null).count();

    // Histogram with the implicit Ordering passed explicitly (how Java
    // reaches a Scala context bound)
    scala.collection.immutable.Seq thresholds =
        scala.jdk.javaapi.CollectionConverters
            .asScala(Arrays.<Object>asList(1, 2)).toSeq();
    scala.collection.immutable.Seq noAggCols =
        scala.jdk.javaapi.CollectionConverters
            .asScala(Collections.<org.apache.spark.sql.Column>emptyList())
            .toSeq();
    Dataset<Row> hist = graft.Histogram.of(
        left.toDF(), thresholds, functions.col("id"), noAggCols,
        (scala.math.Ordering) scala.math.Ordering.Int$.MODULE$);
    Row h = hist.collectAsList().get(0);

    return new long[] {
        nDiff, nChanged, nWith, nWithNullLeft,
        h.getLong(0), h.getLong(1), h.getLong(2)};
  }
}
