package graft

import org.scalatest.funsuite.AnyFunSuite

/** Certifies the Java-callable surface: the summary comes from
  * [[JavaApiParity]] (a pure-Java class compiled by sbt's java test
  * sources), so a regression in the `java.util.List` overloads or the
  * bean-encoder path breaks this spec at compile or assert time. */
class JavaApiSuite extends AnyFunSuite with SparkTest {

  test("Java callers drive diff, diffWith and histogram via java.util.List overloads") {
    val r = JavaApiParity.run(spark).toSeq
    // keys: 1 unchanged, 2 changed, 3 deleted, 4 inserted
    // diffWith: same 4 rows; exactly one (the insert) has a null left
    // histogram over ids {1,2,3}: <=1 -> 1, <=2 -> 1, >2 -> 1
    assert(r == Seq(4L, 1L, 4L, 1L, 1L, 1L, 1L))
  }
}
