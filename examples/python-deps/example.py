"""Ship Python dependencies to executors at runtime — no cluster restart.

The graftspark library can install pip packages (or a poetry project) into
a session-scoped directory that is distributed to every executor and added
to their sys.path, so UDFs can import packages the cluster image does not
carry. Works on a real multi-node cluster; demonstrated here on local mode.

Run (needs pyspark + the graft jar on the driver classpath):

    spark-submit --jars ../../target/scala-2.13/sparkextensionspark_2.13-0.1.0.jar \
        example.py
"""
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "../../python")
import graftspark  # noqa: E402

spark = (
    SparkSession.builder.appName("graft-python-deps-example")
    .master("local[2]")
    .getOrCreate()
)

# Install a pip package into this session only. On a zero-egress sandbox
# this needs a local wheel/sdist path or a warmed pip cache; on a normal
# cluster any requirement spec works ("emoji", "emoji==2.12.1", a VCS URL).
graftspark.install_pip_package(spark, "emoji")

# ...or an entire poetry project with its lock file:
# graftspark.install_poetry_project(spark, "/path/to/project")

# Executors can now import it inside UDFs:
from pyspark.sql.functions import udf  # noqa: E402


@udf("string")
def demojize(s):
    import emoji

    return emoji.demojize(s)


df = spark.createDataFrame([("Spark is :thumbs_up:",)], ["text"])
df.select(demojize("text")).show(truncate=False)

spark.stop()
