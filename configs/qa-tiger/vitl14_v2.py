# MUSIC-AVQA-v2.0 (balanced) training + evaluation: own annotation splits and
# answer vocabulary (reference: data/annots/music_avqa_v2/).
from pathlib import Path
import importlib.util

_base = Path(__file__).parent / "vitl14.py"
_spec = importlib.util.spec_from_file_location("qa_tiger_base_cfg", _base)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

config = _mod.config
config["output_dir"] = './outputs/qa-tiger_vitl14_v2'
config["data"]["train_annot"] = 'annots/music_avqa_v2/train_balance.json'
config["data"]["valid_annot"] = 'annots/music_avqa_v2/balance_valid.json'
config["data"]["test_annot"] = 'annots/music_avqa_v2/test_balance.json'
config["data"]["test_annots"] = [
    'annots/music_avqa_v2/test_bias.json',
]
config["data"]["ans_quelen"] = 'annots/music_avqa_v2/answer2idx.json'
