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

echo "== run A: uninterrupted 4-epoch recipe"
QA_PROOF_OUT=$FULL bash scripts/train.sh "$CFG" > /tmp/proof_full.log 2>&1
echo "run A exit=$?"

echo "== run B: same recipe, killed during epoch 3"
QA_PROOF_OUT=$CUT bash scripts/train.sh "$CFG" > /tmp/proof_cut.log 2>&1 &
CUT_PID=$!
while kill -0 "$CUT_PID" 2>/dev/null; do
    grep -q "training epoch 3" /tmp/proof_cut.log && break
    sleep 5
done
if kill -0 "$CUT_PID" 2>/dev/null; then
    sleep 3   # let a few epoch-3 steps run so the kill lands mid-epoch
    kill "$CUT_PID"
    wait "$CUT_PID" 2>/dev/null
    echo "run B killed mid-epoch-3"
else
    echo "run B finished before the kill — proof invalid"; exit 1
fi

CUT_DIR=$(ls -dt "$CUT"/*/ | head -1)
[ -d "$CUT_DIR/last_state" ] || { echo "no last_state in $CUT_DIR"; exit 1; }
echo "== run C: resume from $CUT_DIR/last_state (epochs 3-4)"
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

def report(d):
    txts = sorted(d.glob("*result.txt"))
    assert txts, f"no result.txt in {d}"
    return txts[0].read_text()

ra, rb = report(full), report(res)
assert ra == rb, f"accuracy reports differ:\n--- full\n{ra}\n--- resumed\n{rb}"
print("final accuracy reports IDENTICAL")
print(ra)
EOF
status=$?
[ $status -eq 0 ] && echo "== PROOF OK: resumed run == uninterrupted run" \
                  || echo "== PROOF FAILED (exit $status)"
exit $status
