package graft;

import java.util.Arrays;
import java.util.Collections;
import java.util.List;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;

import graft.diff.Diff;

/**
 * Exercises the Java-facing API from actual Java source: java.util.List
 * overloads and the static Diff surface. Driven by JavaInteropSuite (no JUnit
 * in the offline environment); compiling this file at all is half the test.
 */
public final class JavaDiffUsage {

    private JavaDiffUsage() {}

    public static Dataset<Row> diffById(Dataset<Row> left, Dataset<Row> right) {
        List<String> ids = Arrays.asList("id");
        List<String> ignore = Collections.emptyList();
        return Diff.of(left, right, ids, ignore);
    }

    public static long countActions(Dataset<Row> left, Dataset<Row> right) {
        return diffById(left, right).select("diff").distinct().count();
    }
}
