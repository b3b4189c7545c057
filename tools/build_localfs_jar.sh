#!/bin/sh
# Rebuild kowari_spark/jars/kowari-localfs.jar from the Java source.
# Needs a JDK and the pyspark-shipped hadoop-client-api jar.
set -e
cd "$(dirname "$0")/.."
HADOOP_JAR=$(python -c "import pyspark, glob, os; print(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), 'jars', 'hadoop-client-api-*.jar'))[0])")
OUT=$(mktemp -d)
javac -encoding UTF-8 -classpath "$HADOOP_JAR" -d "$OUT" kowari_spark/java/kowari/hadoop/NioLocalFileSystem.java
jar cf kowari_spark/jars/kowari-localfs.jar -C "$OUT" kowari
rm -rf "$OUT"
echo "built kowari_spark/jars/kowari-localfs.jar"
