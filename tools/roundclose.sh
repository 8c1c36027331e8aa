#!/usr/bin/env bash
# Round-closing protocol. Run from /root/repo on a quiet box (load < 1):
#
#   bash tools/roundclose.sh [sf_lo_dir] [sf_hi_dir]
#
# Steps (fail-fast):
#  1. sbt test                       - full ScalaTest/ScalaCheck suite
#  2. sbt package                    - library jar for child JVMs
#  3. plan census                    - regenerate PLANS.md via tools/plan_audit.scala
#  4. PlanGuardSpec                  - re-pin CI plan contract against the fresh census
#  5. off-driver oracle gate         - Verify under local-cluster[2,16,4096]
#                                      (two real executor JVMs) + tools/selfcheck.py
#  6. bench lo + hi                  - same-day records at sf0.01 and sf0.1
#
# Outputs land in /tmp/roundclose/: selfcheck_lc.txt, bench_lo.json,
# bench_hi.json. PLANS.md changes (if any) are left staged-for-review in the
# working tree - diff, adjudicate, commit.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_LO="${1:-/root/testdata/sf0.01}"
SF_HI="${2:-/root/testdata/sf0.1}"
OUT=/tmp/roundclose
JAR=target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar
mkdir -p "$OUT"

echo "== [1/6] full test suite (default + ANSI)"
sbt -batch test
# same suite under ANSI SQL mode: strict casts/overflow must not change
# any oracle-pinned result (the r8 gate; kept per-round here so a new
# operator can't silently depend on lenient-mode coercion)
SPARK_GRAFT_ANSI=true sbt -batch test

echo "== [2/6] package"
sbt -batch package

echo "== [3/6] plan census (PLANS.md)"
/opt/spark/bin/spark-shell --master 'local[8]' --jars "$JAR" \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.sql.shuffle.partitions=8 -i tools/plan_audit.scala \
  >"$OUT/plan_audit.log" 2>&1
git --no-pager diff --stat PLANS.md || true

echo "== [4/6] PlanGuardSpec against the fresh census"
sbt -batch "testOnly graft.PlanGuardSpec"

echo "== [5/6] off-driver oracle gate (local-cluster[2,16,4096], $SF_LO)"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,16,4096]' \
SPARK_GRAFT_JARS="$JAR" \
  sbt -batch -Dspark.executor.memory=3g \
    "runMain graft.Verify $SF_LO $OUT/verify_lc"
python3 tools/selfcheck.py "$SF_LO" "$OUT/verify_lc" | tee "$OUT/selfcheck_lc.txt"
grep -q ", 0 fail" "$OUT/selfcheck_lc.txt"

echo "== [6/6] bench lo ($SF_LO) + hi ($SF_HI)"
# Bench self-reports box health (canary band + pass spread — Bench.scala);
# a contaminated record is environment noise signed as measurement (the
# r2/r6/r10 failure mode), so the close REFUSES to bless one: retry up to
# 3x with a quiet wait, fail the close if the box never settles. Pass only
# on an explicit "clean" or "unknown" verdict — a record with NO box_health
# object at all (stale jar, wrong JSON line matched) is a FAILED CAPTURE,
# not a clean one, and retries like contamination (ADVICE r12). "unknown"
# (no canary sample, e.g. a subset run) stays passable: no evidence of
# contamination, and Bench itself retries in-process before its record
# ever lands here (r12).
run_bench() { # $1=sf dir, $2=digest out
  local try
  for try in 1 2 3; do
    SPARK_GRAFT_SF_DIR="$1" sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\{' >"$2"
    if python3 -c "
import json, sys
try:
    d = json.load(open('$2'))
except Exception:
    sys.exit(1)  # unparseable digest = failed capture
v = d.get('box_health', {}).get('verdict')
sys.exit(0 if v in ('clean', 'unknown') else 1)
"; then
      return 0
    fi
    echo "!! bench record contaminated or capture failed (try $try/3): $(python3 -c "
import json
try: print(json.load(open('$2')).get('box_health'))
except Exception as e: print('unparseable digest:', e)")"
    [ "$try" -lt 3 ] && { echo "   waiting 120s for a quieter window"; sleep 120; }
  done
  echo "REFUSING to bless contaminated bench record: $2"
  return 1
}
run_bench "$SF_LO" "$OUT/bench_lo.json"
run_bench "$SF_HI" "$OUT/bench_hi.json"
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
for tag in ("lo", "hi"):
    d = json.load(open(f"{out}/bench_{tag}.json"))
    print(f"{tag}: total={d['value']}s errors={d['errors']} worst5={d['worst5']} box={d.get('box_health',{}).get('verdict')}")
EOF

echo "== roundclose OK - record lo/hi + the selfcheck line in BENCH_NOTES.md"
