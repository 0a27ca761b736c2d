#!/bin/bash
# The full correctness gate, one command — what "done" means for any
# query change (see memory: the r8 q_mmr oracle landed after the last
# full gate run and blanked the round's correctness file; this script
# exists so the gate is never partially run again).
#
#   tools/gate.sh             # full: compile + tests + both corpora
#   tools/gate.sh --changed   # incremental Spark side (plan-hash manifest
#                             # in target/verify_inc), full oracle compare
#
# Exits non-zero on the first failing stage.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-}"
SF=/root/testdata/sf0.01
ADV=advdata

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$m=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens=java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens=java.base/sun.security.action=ALL-UNNAMED"
run_jvm() { java -Xmx100g -cp "$CP" $OPENS "$@"; }

echo "== gate: compile + test =="
sbt -batch compile test

if [ "$MODE" = "--changed" ]; then
  echo "== gate: incremental Verify (sf0.01) =="
  run_jvm graft.Verify "$SF" target/verify_inc --changed
  echo "== gate: oracle compare (sf0.01, full matrix) =="
  python3 tools/oracle_check.py "$SF" target/verify_inc
else
  echo "== gate: full Verify (sf0.01) =="
  rm -rf /tmp/gate_sf && run_jvm graft.Verify "$SF" /tmp/gate_sf
  echo "== gate: oracle compare (sf0.01) =="
  python3 tools/oracle_check.py "$SF" /tmp/gate_sf
  echo "== gate: full Verify (adversarial corpus) =="
  rm -rf /tmp/gate_adv && run_jvm graft.Verify "$ADV" /tmp/gate_adv
  echo "== gate: oracle compare (adversarial corpus) =="
  python3 tools/oracle_check.py "$ADV" /tmp/gate_adv
fi
echo "== gate: PASS =="
