package graft

import graft.text.{ByteBpe, Fim}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fill-in-the-middle: PSM reassembly, rate edges, unicode cuts, and the
  * reserved-special codec composition. */
class FimSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "short"),
    (4L, "café naïve €9 élève"), // multi-byte chars
    (5L, null.asInstanceOf[String]))

  private def out(rate: Double) = texts.toDF("id", "t")
    .select($"id", Fim.fimTransform($"t", $"id", rate).as("f"),
      Fim.applied($"id", rate).as("ap"))
    .as[(Long, String, Boolean)].collect().toSeq.sortBy(_._1)

  test("rate 1 renders PSM everywhere and P+M+S reassembles the original") {
    out(1.0).foreach { case (id, f, ap) =>
      assert(ap)
      val m = "(?s)^<\\|fim_pre\\|>(.*)<\\|fim_suf\\|>(.*)<\\|fim_mid\\|>(.*)$".r
      f match {
        case m(p, s, mid) =>
          val orig = texts.find(_._1 == id).get._2
          assert(p + mid + s == Option(orig).getOrElse(""), s"id $id")
        case _ => fail(s"id $id not PSM-shaped: $f")
      }
    }
  }

  test("rate 0 is the identity (nulls read as ''); deterministic across runs") {
    val a = out(0.0)
    a.foreach { case (id, f, ap) =>
      assert(!ap)
      assert(f == Option(texts.find(_._1 == id).get._2).getOrElse(""))
    }
    assert(out(0.7) == out(0.7))
  }

  test("cuts are character-aligned: multi-byte text never splits a codepoint") {
    // byte-misaligned cuts would produce replacement chars / length drift
    val (_, f, _) = out(1.0).find(_._1 == 4L).get
    val stripped = f.replace(Fim.PreMarker, "").replace(Fim.SufMarker, "")
      .replace(Fim.MidMarker, "")
    assert(stripped.sorted == texts.find(_._1 == 4L).get._2.sorted)
  }

  test("markers compose with the special-token codec: 3 reserved ids, exact round-trip") {
    val docs = texts.toDF("id", "t").filter($"t".isNotNull && length($"t") > 0)
    val model = ByteBpe.train(docs, $"t", numMerges = 6)
    val base = ByteBpe.vocabSize(model)
    val rows = docs.select(
      Fim.fimTransform($"t", $"id", 1.0).as("f"))
      .select($"f",
        ByteBpe.decodeIds(ByteBpe.encodeIds($"f", model, Fim.Specials),
          model, Fim.Specials).as("rt"),
        size(filter(ByteBpe.encodeIds($"f", model, Fim.Specials),
          i => i >= base)).as("ns"))
      .as[(String, String, Int)].collect()
    rows.foreach { case (f, rt, ns) =>
      assert(rt == f)
      assert(ns == 3, s"expected 3 reserved ids in $f")
    }
  }
}
