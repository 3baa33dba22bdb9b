package graft

import java.util.Properties

/**
 * Build-time version introspection, read from the `graft-build.properties`
 * resource baked into the jar (vs [[SparkVersion]]'s runtime values).
 * (reference: /root/reference/src/main/scala/uk/co/gresearch/spark/BuildVersion.scala:22-56)
 */
trait BuildVersion {
  val propertyFileName = "graft-build.properties"

  private lazy val props: Properties = {
    val properties = new Properties
    val in = Option(Thread.currentThread().getContextClassLoader.getResourceAsStream(propertyFileName))
      .orElse(Option(getClass.getClassLoader.getResourceAsStream(propertyFileName)))
      .getOrElse(throw new RuntimeException(s"Property file $propertyFileName not found in class path"))
    try properties.load(in) finally in.close()
    properties
  }

  lazy val VersionString: String = props.getProperty("project.version")

  lazy val BuildSparkMajorVersion: Int = props.getProperty("spark.major.version").toInt
  lazy val BuildSparkMinorVersion: Int = props.getProperty("spark.minor.version").toInt
  lazy val BuildSparkPatchVersion: Int = props.getProperty("spark.patch.version").split("-").head.toInt
  lazy val BuildSparkCompatVersionString: String = props.getProperty("spark.compat.version")

  lazy val BuildScalaMajorVersion: Int = props.getProperty("scala.major.version").toInt
  lazy val BuildScalaMinorVersion: Int = props.getProperty("scala.minor.version").toInt
  lazy val BuildScalaPatchVersion: Int = props.getProperty("scala.patch.version").toInt
  lazy val BuildScalaCompatVersionString: String = props.getProperty("scala.compat.version")

  lazy val BuildSparkVersion: (Int, Int, Int) =
    (BuildSparkMajorVersion, BuildSparkMinorVersion, BuildSparkPatchVersion)
  lazy val BuildSparkCompatVersion: (Int, Int) = (BuildSparkMajorVersion, BuildSparkMinorVersion)
  lazy val BuildScalaVersion: (Int, Int, Int) =
    (BuildScalaMajorVersion, BuildScalaMinorVersion, BuildScalaPatchVersion)
  lazy val BuildScalaCompatVersion: (Int, Int) = (BuildScalaMajorVersion, BuildScalaMinorVersion)
}

object BuildVersion extends BuildVersion
