// Standalone example project: depends on the graft library jar built by
// the parent repo (`sbt package` at the repo root) plus the Spark jars
// shipped with the image. Build + run from this directory:
//
//   cd examples/scala
//   sbt "run /root/testdata/sf0.001"
//
ThisBuild / scalaVersion := "2.13.17"
name := "graft-example"
// Spark ships with the image (zero-egress environment)
unmanagedBase := file("/opt/spark/jars")
// the library under demonstration: the parent build's packaged jar
Compile / unmanagedJars +=
  baseDirectory.value / ".." / ".." / "target" / "scala-2.13" /
    "sparkextensionspark_2.13-0.1.0.jar"
run / fork := true
// Spark 4.x on JDK 17 outside spark-submit needs the module opens
javaOptions ++= Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++
  Seq("-Dspark.ui.enabled=false", "-Xmx4g")
