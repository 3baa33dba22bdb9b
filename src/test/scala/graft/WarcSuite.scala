package graft

import java.nio.charset.StandardCharsets

import graft.sources.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC/WET ingest: exact record round-trip, octet-counted multibyte
  * payloads, gzip members, truncation tolerance, end-to-end binaryFile read. */
class WarcSuite extends AnyFunSuite with SparkTest {

  private def rec(wType: String, uri: String, payload: String): Array[Byte] = {
    val body = payload.getBytes(StandardCharsets.UTF_8)
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $wType\r\n")
    if (uri != null) hdr.append(s"WARC-Target-URI: $uri\r\n")
    hdr.append("WARC-Date: 2026-08-15T00:00:00Z\r\n")
      .append(s"Content-Length: ${body.length}\r\n\r\n")
    hdr.toString.getBytes(StandardCharsets.US_ASCII) ++ body ++
      "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
  }

  private def shard(recs: Array[Byte]*): Array[Byte] = recs.reduce(_ ++ _)

  test("plain WET shard parses every record with exact fields") {
    val bytes = shard(
      rec("warcinfo", null, "software: test\r\n"),
      rec("conversion", "http://ex.com/a", "hello world"),
      rec("conversion", "http://ex.com/b", "second doc text"))
    val got = Warc.parseRecords(bytes)
    assert(got.map(r => (r._1, r._2)) == Seq(
      ("warcinfo", null), ("conversion", "http://ex.com/a"),
      ("conversion", "http://ex.com/b")))
    assert(got(1)._5 == "hello world" && got(1)._4 == 11L)
    assert(got(2)._5 == "second doc text")
  }

  test("warc_records COMPILES under codegen (no interpreted fallback)") {
    // parseToArrayData is called through the Warc class's static forwarder
    // in generated Java; a restricted modifier drops the forwarder and the
    // expression silently falls back to interpreted eval. CODEGEN_ONLY
    // turns that silent regression into a hard failure.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val bytes = shard(rec("conversion", "http://ex.com/a", "hello world"))
      val n = Seq(Tuple1(bytes)).toDF("b")
        .select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
        .count()
      assert(n == 1L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("Content-Length counts OCTETS: multibyte payloads round-trip") {
    val payload = "café 中文 text" // 2-byte and 3-byte chars
    val bytes = shard(rec("conversion", "http://ex.com/u", payload))
    val got = Warc.parseRecords(bytes)
    assert(got.head._5 == payload)
    assert(got.head._4 == payload.getBytes(StandardCharsets.UTF_8).length.toLong)
  }

  test("gzip shards parse, including concatenated one-member-per-record") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val r1 = rec("conversion", "http://ex.com/a", "alpha")
    val r2 = rec("conversion", "http://ex.com/b", "beta")
    // whole-shard gzip
    assert(Warc.parseRecords(gz(shard(r1, r2))).map(_._5) == Seq("alpha", "beta"))
    // the Common Crawl layout: one gz member per record, concatenated
    assert(Warc.parseRecords(gz(r1) ++ gz(r2)).map(_._5) == Seq("alpha", "beta"))
  }

  test("truncated tail and bad lengths never produce phantom records") {
    val good = rec("conversion", "http://ex.com/a", "alpha")
    val truncated = rec("conversion", "http://ex.com/b", "a long payload here")
      .dropRight(12)
    assert(Warc.parseRecords(shard(good, truncated)).map(_._5) == Seq("alpha"))
    val badLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: nope\r\n\r\npayload\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    assert(Warc.parseRecords(shard(good, badLen)).map(_._5) == Seq("alpha"))
    assert(Warc.parseRecords(Array.emptyByteArray).isEmpty)
  }

  test("gzip-bomb guard: decompression stops at the cap with truncated-tail semantics") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // a highly compressible shard: many identical records (a tiny gz input
    // inflating far past the cap — the bomb shape)
    val one = rec("conversion", "http://ex.com/x", "z" * 1000)
    val shardBytes = shard(Seq.fill(200)(one): _*)
    val bomb = gz(shardBytes)
    assert(bomb.length < shardBytes.length / 10) // genuinely compressible
    // uncapped: all 200 records
    assert(Warc.parseRecords(bomb).size == 200)
    // capped at ~10 records' worth: parse stops cleanly at the truncated
    // tail — records up to the cap, NO throw, no phantom record
    val cap = one.length.toLong * 10 + 50
    val got = Warc.parseRecords(bomb, maxBytes = cap)
    assert(got.size == 10 && got.forall(_._5 == "z" * 1000))
    // the inflated buffer never exceeds the cap (OOM guard), and a cap
    // beyond the JVM array ceiling clamps instead of overflowing
    assert(Warc.gunzipIfNeeded(bomb, cap).length <= cap)
    assert(Warc.gunzipIfNeeded(bomb, Long.MaxValue).length == shardBytes.length)
    intercept[IllegalArgumentException](Warc.gunzipIfNeeded(bomb, 0L))
  }

  test("readWarc: binaryFile end-to-end, one row per record, files in parallel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s1.warc.wet"),
      shard(rec("warcinfo", null, "info"),
        rec("conversion", "http://ex.com/1", "doc one")))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s2.warc.wet"),
      shard(rec("conversion", "http://ex.com/2", "doc two")))
    val got = Warc.readWarc(spark, dir)
      .where(col("warc_type") === "conversion")
      .orderBy("target_uri")
      .collect()
    assert(got.map(_.getAs[String]("payload")).toSeq == Seq("doc one", "doc two"))
    assert(got.map(_.getAs[String]("target_uri")).toSeq ==
      Seq("http://ex.com/1", "http://ex.com/2"))
    // payloads flow into the text kernels with no shuffle
    val plan = Warc.readWarc(spark, dir)
      .select(graft.text.TextFunctions.tokenize(col("payload"),
        graft.text.TextFunctions.AsciiTokenPattern))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
