# Full-recipe on-TPU training proof: the demo_synth recipe lengthened to 6
# epochs so a mid-run SIGKILL + `resume` restart has real work on both sides
# of the cut (post-compile epochs on the small demo corpus take only ~2 s
# each — the extra epochs keep the kill window comfortably wider than the
# watcher's 0.5 s poll). Used by scripts/train_resume_proof.sh (which
# parameterizes the output dir / resume source via env vars so one config
# serves the uninterrupted run, the killed run, and the resumed run); see
# docs/PROFILE.md ("Full-recipe training proof") for the recorded run.
import importlib.util
import os
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "demo_synth", Path(__file__).with_name("demo_synth.py"))
_base = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_base)

config = dict(_base.config)
config.update(
    epochs=6,
    output_dir=os.environ.get('QA_PROOF_OUT', './outputs/demo_proof'),
)
if os.environ.get('QA_PROOF_RESUME'):
    config['resume'] = os.environ['QA_PROOF_RESUME']
