#!/bin/bash
# Round-18 consolidated bench session: run EVERYTHING sequentially in
# one script (same-session A/B where it matters; never concurrent with
# sbt or another bench JVM). Results append to /tmp/bench_r18.jsonl.
set -u
OUT=/tmp/bench_r18.jsonl
: > "$OUT"
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens $p=ALL-UNNAMED"; done
run_main() { # main args...
  java $FLAGS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx24g -cp "$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
}

echo "=== full bench sf0.1 ===" >&2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  "$REPO_ROOT/tools/bench.sh" 2>/dev/null | grep '"metric"' >> "$OUT"

echo "=== span dedup A/B sf10 (literal vs bloom) ===" >&2
GRAFT_SPAN_DEDUP=literal,bloom \
  run_main graft.SpanScaleBench /tmp/graftsf/sf10 4 2>/dev/null \
  | grep '"metric"' >> "$OUT"

echo "=== span dedup A/B sf30 (literal vs bloom) ===" >&2
GRAFT_SPAN_DEDUP=literal,bloom \
  run_main graft.SpanScaleBench /tmp/graftsf/sf30 4 2>/dev/null \
  | grep '"metric"' >> "$OUT"

echo "=== span dedup sf100 (literal vs sampled census-with-first) ===" >&2
GRAFT_SPAN_DEDUP=literal,sampled \
  run_main graft.SpanScaleBench /tmp/graftsf/sf100 0 2>/dev/null \
  | grep '"metric"' >> "$OUT"

echo "=== lm scale sf10 (materialized vs legacy) ===" >&2
run_main graft.LmScaleBench /tmp/graftsf/sf10 2>/dev/null \
  | grep '"metric"' >> "$OUT"

echo "=== lm scale sf100 (materialized vs legacy) ===" >&2
run_main graft.LmScaleBench /tmp/graftsf/sf100 2>/dev/null \
  | grep '"metric"' >> "$OUT"

echo "=== done ===" >&2
cat "$OUT"
