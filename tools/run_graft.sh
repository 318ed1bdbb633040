#!/bin/bash
# Dev runner: launch a graft main (graft.Verify, graft.Bench,
# graft.tools.Soak, graft.Plans) from the compiled classes dir WITHOUT
# holding the sbt lock — `sbt compile` first, then e.g.:
#   tools/run_graft.sh graft.Verify /tmp/graft_soak/x10 /tmp/out
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, heap).
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" "$@"
