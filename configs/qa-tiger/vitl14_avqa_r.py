# MUSIC-AVQA-R robustness evaluation: trains on MUSIC-AVQA, evaluates on the
# rephrased head/tail/head-tail test splits (reference README workflow; annot
# files from the MUSIC-AVQA-R release under data/annots/music_avqa_r/).
from pathlib import Path
import importlib.util

_base = Path(__file__).parent / "vitl14.py"
_spec = importlib.util.spec_from_file_location("qa_tiger_base_cfg", _base)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

config = _mod.config
config["output_dir"] = './outputs/qa-tiger_vitl14_avqa_r'
config["data"]["test_annot"] = 'annots/music_avqa_r/avqa-test-headtail.json'
config["data"]["test_annots"] = [
    'annots/music_avqa_r/avqa-test-head.json',
    'annots/music_avqa_r/avqa-test-tail.json',
]
