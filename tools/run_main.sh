#!/bin/bash
# Run a graft main directly on the sbt-compiled classes (skips sbt startup).
# Usage: tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Env: SPARK_DRIVER_MEM (default 8g) plus whatever the main reads.
set -u
CP=$(cat /tmp/cp.txt 2>/dev/null)
if [ -z "$CP" ]; then
  CP=$(cd /root/repo && sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1)
  echo "$CP" > /tmp/cp.txt
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS ${EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$CP" "$@"
