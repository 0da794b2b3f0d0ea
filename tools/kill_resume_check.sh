#!/bin/bash
# Crash-consistency witness: SIGKILL the flagship ER job mid-run, then
# resume from its partial checkpoint and compare against a clean run.
#
#   tools/kill_resume_check.sh [sf_dir] [kill_after_seconds]
#
# Expected: the resumed run reports resumed_pairs_checkpoint=true with
# partitions_skipped > 0 (kill landed inside the partitioned scoring
# stage) and IDENTICAL n_records / n_links / pairwise F1 to the clean
# run. A kill that lands before the first partition checkpoint simply
# recomputes everything (partitions_skipped=0) — still identical output.
set -u
SF=${1:-/root/testdata/sf0.1}
KILL_AFTER=${2:-17}
CK=/tmp/kill_ck; OUT1=/tmp/kill_out1; OUT2=/tmp/kill_out2; OUTC=/tmp/kill_outc
rm -rf "$CK" "$OUT1" "$OUT2" "$OUTC"

python tools/run_job.py --sf-dir "$SF" --output "$OUTC" --num-cpus 8 2>/dev/null | tail -1 > /tmp/kill_clean.json

python tools/run_job.py --sf-dir "$SF" --output "$OUT1" --checkpoint-dir "$CK" --num-cpus 8 2>/dev/null &
PID=$!
sleep "$KILL_AFTER"
kill -9 "$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "killed after ${KILL_AFTER}s; checkpoint files: $(find "$CK" -type f 2>/dev/null | wc -l)"

python tools/run_job.py --sf-dir "$SF" --output "$OUT2" --checkpoint-dir "$CK" --num-cpus 8 2>/dev/null | tail -1 > /tmp/kill_resumed.json

echo "CLEAN:   $(cat /tmp/kill_clean.json)"
echo "RESUMED: $(cat /tmp/kill_resumed.json)"

python - <<'EOF'
import json, sys
clean = json.load(open("/tmp/kill_clean.json"))
res = json.load(open("/tmp/kill_resumed.json"))
for k in ("n_records", "n_links"):
    assert clean[k] == res[k], (k, clean[k], res[k])
assert clean["pairwise"] == res["pairwise"], (clean["pairwise"], res["pairwise"])
print("IDENTICAL: n_records=%d n_links=%d f1=%s (resumed skipped %s partitions)" % (
    res["n_records"], res["n_links"], res["pairwise"]["f1"],
    res["counters"].get("partitions_skipped", 0)))
EOF
