#!/bin/bash
# Run a graft main class directly with java (sbt's server JVM inflates
# Spark wall-clock ~6x). Usage: tools/run.sh graft.Verify <args...>
set -e
cd "$(dirname "$0")/.."
SCALA_LIB=$(find "$HOME/.cache/coursier" "$HOME/.ivy2" -name 'scala-library-2.13*.jar' 2>/dev/null | head -1)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-16g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" "$@"
