#!/bin/sh
# Compile the JVM-side age crypto UDFs into jvm/age-spark-udf.jar.
# Pure JDK 17 + the Spark jars already shipped with pyspark (UDF2 interface
# only).  Idempotent; duckdb_age_spark.jvm.ensure_jar() invokes this lazily
# and caches on source mtime.
set -e
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
rm -rf classes && mkdir -p classes
javac -encoding UTF-8 -classpath "$SPARK_JARS/*" -d classes src/agespark/*.java
jar cf age-spark-udf.jar -C classes .
echo "built $(pwd)/age-spark-udf.jar"
