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

# --ab <ref>: STRUCTURAL same-box A/B — check out <ref> in a throwaway
# worktree, compile it, bench it, then bench the current tree
# back-to-back, and write the {prev, shipped} totals + loadavg into
# BENCH_AB.json at the repo root. graft.Bench embeds that file into its
# own JSON line (the "ab" key), so the round's bench artifact carries
# its own control instead of depending on a cross-session total
# comparison that box noise confounds.
if [ "$1" = "--ab" ]; then
  REF="$2"; shift 2
  set -e
  REF_SHA=$(git -C "$REPO_ROOT" rev-parse --short "$REF")
  AB_DIR=$(mktemp -d /tmp/graft_ab_XXXXXX)
  rmdir "$AB_DIR"
  git -C "$REPO_ROOT" worktree add --detach "$AB_DIR" "$REF" 1>&2
  trap 'git -C "$REPO_ROOT" worktree remove --force "$AB_DIR" 1>&2 || true' EXIT
  echo "[ab] compiling $REF_SHA in $AB_DIR" 1>&2
  # copyResources is NOT part of sbt compile: without it the classes
  # dir lacks META-INF/services/...DataSourceRegister and every
  # graft-topiclog DSv2 entry fails with DATA_SOURCE_NOT_FOUND (the
  # main tree never sees this because runMain/test copy resources
  # there) — found when the first --ab prev arm failed its 6
  # streaming-lifecycle entries deterministically
  (cd "$AB_DIR" && sbt -batch 'Compile/compile' 'Compile/copyResources' 1>&2)
  # let the compile's load decay before the FIRST arm: whichever arm
  # runs first otherwise absorbs the residual (observed: the same tree
  # at 258 s first-after-compile vs 170 s solo quiet) — bounded wait
  for i in $(seq 1 16); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l < 0.7)}' && break
    echo "[ab] post-compile loadavg $L — cooling ($i/16)" 1>&2
    sleep 30
  done
  # ONE recorded pass per arm, back-to-back. (A warm-up pass per arm
  # was tried and retired: the box degrades over consecutive full
  # benches — a 4th-in-a-row run recorded 599 s for a tree that
  # benches 170 s solo — so extra passes ADD the confound they were
  # meant to remove. The one deterministic worktree failure mode,
  # missing copied resources, is fixed above.)
  #
  # ARM ORDER: shipped FIRST, prev second. Both arms read the same
  # fixture parquet and jars, so the second arm rides the first's page
  # cache — the orientation is chosen so any residual warmth favors
  # the PREV tree, making a "shipped is not slower" reading
  # conservative (the CompactionScaleBench discipline). The order is
  # recorded in the artifact.
  LOAD0=$(cut -d' ' -f1 /proc/loadavg)
  echo "[ab] benching shipped (HEAD), loadavg $LOAD0" 1>&2
  SHIP_LINE=$("$REPO_ROOT/tools/bench.sh" "$@" | head -1)
  LOAD1=$(cut -d' ' -f1 /proc/loadavg)
  echo "[ab] benching prev ($REF_SHA), loadavg $LOAD1" 1>&2
  PREV_LINE=$("$AB_DIR/tools/bench.sh" "$@" | head -1)
  LOAD2=$(cut -d' ' -f1 /proc/loadavg)
  SHIP_SHA=$(git -C "$REPO_ROOT" rev-parse --short HEAD)
  python3 - "$REF_SHA" "$LOAD0" "$LOAD1" "$LOAD2" "$REPO_ROOT" \
      "$PREV_LINE" "$SHIP_LINE" "$SHIP_SHA" <<'PYEOF' 1>&2
import json, sys, time
ref, l0, l1, l2, root, prev_line, ship_line, ship_sha = sys.argv[1:9]
prev, ship = json.loads(prev_line), json.loads(ship_line)
rec = {"ref": ref, "shipped_sha": ship_sha,
       "prev_total": prev["value"], "shipped_total": ship["value"],
       "prev_n": len(prev["queries"]), "shipped_n": len(ship["queries"]),
       "prev_failed": prev.get("failed", []),
       "shipped_failed": ship.get("failed", []),
       "order": "shipped-first (residual cache warmth favors prev)",
       "loadavg": [float(l0), float(l1), float(l2)],
       "sf": ship.get("sf", ""), "recorded_unix": int(time.time())}
with open(f"{root}/BENCH_AB.json", "w") as f:
    f.write(json.dumps(rec) + "\n")
print("[ab] wrote BENCH_AB.json:", json.dumps(rec))
PYEOF
  echo "$PREV_LINE"
  echo "$SHIP_LINE"
  exit 0
fi

exec java $FLAGS $EXTRA_JAVA_OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$REPO_ROOT/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench "$@"
