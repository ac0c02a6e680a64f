#!/bin/bash
# Direct-JVM bench wrapper (same flags as build.sbt's run fork) so a
# bench can run while sbt holds the build lock.
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens $p=ALL-UNNAMED"; done
# Classpath is derived from this script's own location so a checkout or
# worktree benches ITSELF, not /root/repo (a hard-coded path once made an
# A/B run bench the wrong tree).
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
exec java $FLAGS $EXTRA_JAVA_OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench "$@"
