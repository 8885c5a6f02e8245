"""Exercise the shipped MUSIC-AVQA-R config end to end.

The real ``annots/music_avqa_r/avqa-test-{head,tail,headtail}.json`` files
are unobtainable offline (reference ``.MISSING_LARGE_BLOBS:2-4``), so this
test generates schema-correct synthetic head/tail/headtail splits and runs
``src/test.py --config configs/qa-tiger/vitl14_avqa_r.py`` (the actual
shipped config file, with data root + model dims overridden) over them,
asserting the multi-test-annot loop (reference src/test.py:36-44) produces a
complete per-qtype report for every split.
"""
import importlib.util
import json
import re
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parents[1]

D_MODEL, VIDEO_DIM, PATCH_DIM, AUDIO_DIM = 32, 64, 48, 24
T, P, TOPK, EXPERTS = 12, 4, 3, 5

ALL_TYPES = [
    '["Audio", "Counting"]', '["Audio", "Comparative"]',
    '["Visual", "Counting"]', '["Visual", "Location"]',
    '["Audio-Visual", "Existential"]', '["Audio-Visual", "Counting"]',
    '["Audio-Visual", "Location"]', '["Audio-Visual", "Comparative"]',
    '["Audio-Visual", "Temporal"]',
]
ANSWERS = [str(i) for i in range(12)] + ["yes", "no"] + [
    f"instrument{i}" for i in range(28)]
assert len(ANSWERS) == 42
VIDEOS = [f"r{i:03d}" for i in range(4)]

ACC_RE = re.compile(r"Test\s+([\w\-/ ]+?)\s+accuracy: ([\d.]+)\((\d+)/(\d+)\)")


def _annots(rng, n, offset):
    # MUSIC-AVQA-R rephrased-split schema == MUSIC-AVQA test schema
    # (video_id / question_id / type / question_content / templ_values /
    # anser); head vs tail differ only in answer distribution
    return [{
        "video_id": VIDEOS[(offset + i) % len(VIDEOS)],
        "question_id": offset * 1000 + i,
        "type": ALL_TYPES[i % 9],
        "question_content": "How many instruments are playing in the "
                            "<Object> video?",
        "templ_values": '["ukulele"]',
        "anser": ANSWERS[int(rng.integers(0, 42))],
    } for i in range(n)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("avqa_r")
    rng = np.random.default_rng(7)
    for sub, shape in [("vggish", (T, AUDIO_DIM)), ("clip", (T, VIDEO_DIM)),
                       ("tome", (T, P, PATCH_DIM))]:
        d = root / sub
        d.mkdir(parents=True)
        for v in VIDEOS:
            np.save(d / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))
    r_dir = root / "annots" / "music_avqa_r"
    r_dir.mkdir(parents=True)
    head = _annots(rng, 18, 0)
    tail = _annots(rng, 9, 1)
    (r_dir / "avqa-test-head.json").write_text(json.dumps(head))
    (r_dir / "avqa-test-tail.json").write_text(json.dumps(tail))
    (r_dir / "avqa-test-headtail.json").write_text(json.dumps(head + tail))
    vocab_dir = root / "annots" / "music_avqa"
    vocab_dir.mkdir(parents=True)
    (vocab_dir / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)},
         "max_que_len": 24}))
    return root


def test_avqa_r_config_multi_annot_report(corpus, monkeypatch, tmp_path):
    import qa_tiger_tpu.models.clip_text as ct
    from qa_tiger_tpu.parallel import mesh as mesh_mod

    monkeypatch.setitem(ct.CLIP_TEXT_CONFIGS, "tiny-avqa-r",
                        dict(width=64, heads=4, layers=2, embed_dim=64))

    # wrap the SHIPPED avqa_r config (so its base-derivation + test_annots
    # wiring is what's exercised), overriding only data root / sizes / dims
    cfg_file = tmp_path / "avqa_r_test_cfg.py"
    cfg_file.write_text(f"""
import importlib.util
_spec = importlib.util.spec_from_file_location(
    "shipped_avqa_r", {str(REPO / 'configs/qa-tiger/vitl14_avqa_r.py')!r})
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
config = _mod.config
config["data"].update(dict(
    root={str(corpus)!r}, batch_size=9, eval_batch_size=9, num_workers=0,
    quest_feat=None, prompt_feat=None,
    audio_feat="vggish", video_feat="clip", patch_feat="tome"))
config["hyper_params"]["model"].update(dict(
    d_model={D_MODEL}, video_dim={VIDEO_DIM}, patch_dim={PATCH_DIM},
    audio_dim={AUDIO_DIM}, topK={TOPK}, num_experts={EXPERTS},
    encoder_type="tiny-avqa-r"))
config["weight"] = ''
""")

    real_make_mesh = mesh_mod.make_mesh
    spec = importlib.util.spec_from_file_location(
        "qa_avqa_r_test_entry", REPO / "src" / "test.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        mod, "make_mesh",
        lambda *a, **k: real_make_mesh(
            *a, **{**k, "devices": jax.devices("cpu")}))
    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--config", str(cfg_file),
        "--output_path", str(out_dir)])
    mod.main()

    # no --weight: the result file lands under <output_path>/_result.txt
    results = list(out_dir.glob("*result.txt"))
    assert results, f"no result file in {out_dir}"
    text = results[0].read_text()

    # the headtail split runs first (test_annot), then the test_annots loop
    # announces + evaluates head and tail (reference src/test.py:36-44)
    assert "avqa-test-head.json" in text
    assert "avqa-test-tail.json" in text

    # three full reports: 9 per-type + 3 per-modality + total each
    acc_lines = ACC_RE.findall(text)
    assert len(acc_lines) == 3 * 13, f"expected 39 accuracy lines, got " \
        f"{len(acc_lines)}:\n{text}"
    # totals: headtail = 27, head = 18, tail = 9 samples
    totals = [int(t) for name, _v, _c, t in acc_lines if name == "Total avg"]
    assert totals == [27, 18, 9]
