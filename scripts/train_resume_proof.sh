#!/bin/bash
# Full-recipe training proof (VERDICT r3 item 7): run the shipped recipe
# end-to-end via scripts/train.sh, kill it mid-epoch-3, resume from the
# Orbax/npz train state, and verify the resumed run reproduces the
# uninterrupted run EXACTLY (bitwise-equal best.npz + identical final
# accuracy report). Exercises train.sh + loop + scheduler + checkpoint/
# resume + eval in one shot on whatever backend is active (TPU by default).
#
#   bash scripts/train_resume_proof.sh          (~30-60 min on-chip; logs
#                                                in /tmp/proof_*.log)
#
# The resume stream is bitwise-faithful because (a) the per-step dropout
# RNG rides in the checkpoint meta (AVQARunner.train_state), (b) epoch
# shuffles are (seed, epoch)-keyed, not stateful, and (c) Adam moments are
# part of the saved state.
set -u
cd "$(dirname "$0")/.."

CFG=configs/qa-tiger/demo_synth_proof.py
FULL=./outputs/demo_proof_full
CUT=./outputs/demo_proof_cut

[ -f data/annots/demo/train.json ] || python scripts/make_demo_data.py

rm -rf "$FULL" "$CUT"

echo "== run A: uninterrupted 6-epoch recipe"
QA_PROOF_OUT=$FULL bash scripts/train.sh "$CFG" > /tmp/proof_full.log 2>&1
echo "run A exit=$?"

echo "== run B: same recipe, SIGKILLed at epoch 3"
QA_PROOF_OUT=$CUT bash scripts/train.sh "$CFG" > /tmp/proof_cut.log 2>&1 &
CUT_PID=$!
# post-compile epochs on the demo corpus take only seconds: poll fast and
# kill the python (the grandchild, found via the log fd — killing only the
# train.sh wrapper would orphan it) the moment epoch 3 begins. SIGKILL, so
# no atexit/checkpoint cleanup can soften the cut.
while kill -0 "$CUT_PID" 2>/dev/null; do
    grep -q "training epoch 3" /tmp/proof_cut.log && break
    sleep 0.5
done
if kill -0 "$CUT_PID" 2>/dev/null; then
    for pid in $(ls /proc | grep -E '^[0-9]+$'); do
        if ls -l "/proc/$pid/fd" 2>/dev/null | grep -q proof_cut.log \
           && grep -qa "src/train.py" "/proc/$pid/cmdline" 2>/dev/null; then
            kill -9 "$pid"
        fi
    done
    kill "$CUT_PID" 2>/dev/null
    wait "$CUT_PID" 2>/dev/null
    grep -q "training epoch 4" /tmp/proof_cut.log \
        && { echo "kill landed after epoch 3 — window missed"; exit 1; }
    echo "run B SIGKILLed during epoch 3"
else
    echo "run B finished before the kill — proof invalid"; exit 1
fi

CUT_DIR=$(ls -dt "$CUT"/*/ | head -1)
[ -d "$CUT_DIR/last_state" ] || { echo "no last_state in $CUT_DIR"; exit 1; }
echo "== run C: resume from $CUT_DIR/last_state (epochs 3-6)"
QA_PROOF_OUT=$CUT QA_PROOF_RESUME="$CUT_DIR/last_state" \
    bash scripts/train.sh "$CFG" > /tmp/proof_resume.log 2>&1
echo "run C exit=$?"

FULL_DIR=$(ls -dt "$FULL"/*/ | head -1)
RES_DIR=$(ls -dt "$CUT"/*/ | head -1)
echo "== comparing $FULL_DIR vs $RES_DIR"
python - "$FULL_DIR" "$RES_DIR" <<'EOF'
import sys
import numpy as np
from pathlib import Path

full, res = Path(sys.argv[1]), Path(sys.argv[2])
a = np.load(full / "best.npz")
b = np.load(res / "best.npz")
assert sorted(a.files) == sorted(b.files), "key sets differ"
bad = [k for k in a.files if not np.array_equal(a[k], b[k])]
assert not bad, f"best.npz differs after resume: {bad[:5]}"
print(f"best.npz BITWISE EQUAL ({len(a.files)} arrays)")

# The train entry logs the end-of-training test report into log.txt
# (result.txt is the TEST entry's artifact); compare the final metrics
# block — every per-qtype "Test ... accuracy" line after the last
# "testing" banner.
def report(d):
    lines = (d / "log.txt").read_text().splitlines()
    acc = [l.split("]:", 1)[-1] for l in lines if "accuracy:" in l and "Test" in l]
    assert acc, f"no final Test accuracy block in {d}/log.txt"
    return "\n".join(acc[-10:])

ra, rb = report(full), report(res)
assert ra == rb, f"accuracy reports differ:\n--- full\n{ra}\n--- resumed\n{rb}"
print("final accuracy reports IDENTICAL:")
print(ra)
EOF
status=$?
[ $status -eq 0 ] && echo "== PROOF OK: resumed run == uninterrupted run" \
                  || echo "== PROOF FAILED (exit $status)"
exit $status
