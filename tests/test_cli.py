"""End-to-end CLI smoke: src/train.py and src/test.py over a synthetic corpus.

Builds a miniature MUSIC-AVQA-shaped dataset (features + annots + vocab + a
python config file), runs the full training entry point (2 epochs, tiny
model) in-process, checks that best.npz lands and the final test runs, then
evaluates it again through the test entry point.
"""
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parents[1]

T, P = 12, 4
VIDEOS = [f"v{i:03d}" for i in range(6)]
ANSWERS = ["one", "two", "yes", "no"]
TYPES = ['["Audio", "Counting"]', '["Visual", "Location"]',
         '["Audio-Visual", "Temporal"]']


def _load_entry(name):
    spec = importlib.util.spec_from_file_location(
        f"qa_cli_{name}", REPO / "src" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        d = data / sub
        d.mkdir(parents=True)
        for v in VIDEOS:
            np.save(d / f"{v}.npy", rng.standard_normal(shape).astype(np.float32))

    def annots(n, start=0):
        return [{
            "video_id": VIDEOS[(start + i) % len(VIDEOS)],
            "question_id": start + i,
            "type": TYPES[i % 3],
            "question_content": "How many instruments are playing?",
            "templ_values": "[]",
            "anser": ANSWERS[i % len(ANSWERS)],
        } for i in range(n)]

    (data / "train.json").write_text(json.dumps(annots(24)))
    (data / "val.json").write_text(json.dumps(annots(12, 100)))
    (data / "test.json").write_text(json.dumps(annots(12, 200)))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)}, "max_que_len": 24}))

    cfg_file = root / "tiny.py"
    cfg_file.write_text(f"""
config = dict(
    type='qa-tiger', seed=1, epochs=2, num_labels={len(ANSWERS)},
    log_interval=100,
    output_dir='{(root / 'out').as_posix()}',
    weight='',
    data=dict(
        root='{data.as_posix()}', img_size=336, batch_size=8,
        eval_batch_size=8, num_workers=0, frame_sample_rate=1,
        train_annot='train.json', valid_annot='val.json',
        test_annot='test.json', test_annots=None,
        ans_quelen='answer2idx.json',
        quest_feat=None, audio_feat='vggish', video_feat='clip',
        patch_feat='tome', prompt_feat=None,
    ),
    hyper_params=dict(
        gpus='0', model_type='QA-TIGER_tiny',
        model=dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
                   topK=2, num_experts=4, encoder_type='tiny-test'),
        optim=dict(lr=1e-3, encoder_lr=None, min_lr=1e-7, weight_decay=0,
                   betas=(0.95, 0.999)),
        sched=dict(name='StepLR', mode='min', gamma=0.1, step_size=8,
                   factor=0.5, patience=5, verbose=True, warmup_epochs=1),
    ),
)
""")
    return root


@pytest.fixture(autouse=True)
def _tiny_encoder(monkeypatch):
    import qa_tiger_tpu.models.clip_text as ct

    monkeypatch.setitem(ct.CLIP_TEXT_CONFIGS, "tiny-test",
                        dict(width=32, heads=4, layers=2, embed_dim=32))
    # keep the smoke run on the virtual CPU devices
    from qa_tiger_tpu.parallel import mesh as mesh_mod

    real_make_mesh = mesh_mod.make_mesh
    monkeypatch.setattr(
        mesh_mod, "make_mesh",
        lambda *a, **k: real_make_mesh(
            *a, **{**k, "devices": jax.devices("cpu")}))


def _cpu_mesh(*args, n_devices=None, **kwargs):
    from qa_tiger_tpu.parallel import mesh as mesh_mod

    return mesh_mod.make_mesh(n_devices=n_devices,
                              devices=jax.devices("cpu"))


def test_train_then_test_cli(workdir, monkeypatch, capsys):
    train_mod = _load_entry("train")
    monkeypatch.setattr(train_mod, "make_mesh", _cpu_mesh)
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--config", str(workdir / "tiny.py"), "--mode", "train"])
    train_mod.main()

    runs = list((workdir / "out").iterdir())
    assert runs, "no run directory created"
    best = runs[0] / "best.npz"
    assert best.exists(), "best checkpoint not saved"
    assert (runs[0] / "log.txt").exists()
    assert (runs[0] / "code_snapshot.zip").exists()

    test_mod = _load_entry("test")
    monkeypatch.setattr(test_mod, "make_mesh", _cpu_mesh)
    out_dir = workdir / "eval_out"
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--config", str(workdir / "tiny.py"), "--mode", "test",
        "--weight", str(best), "--output_path", str(out_dir),
        "--topK", "2", "--n_experts", "4"])
    test_mod.main()
    results = list(out_dir.glob("*_result.txt"))
    assert results, "no result file written"
    text = results[0].read_text()
    assert "Total avg" in text


def test_predict_cli(workdir, monkeypatch, capsys):
    """src/predict.py answers one (question, video) pair from features and
    prints one JSON line with the top-k answers."""
    predict_mod = _load_entry("predict")
    monkeypatch.setattr(predict_mod, "make_mesh", _cpu_mesh)
    monkeypatch.setattr(sys, "argv", [
        "predict.py", "--config", str(workdir / "tiny.py"),
        "--question", "How many instruments are playing?",
        "--video", VIDEOS[0], "--topk", "3"])
    predict_mod.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["video"] == VIDEOS[0]
    assert out["answer"] in ANSWERS
    assert len(out["topk"]) == 3
    probs = [t["prob"] for t in out["topk"]]
    assert probs == sorted(probs, reverse=True)
    assert all(t["answer"] in ANSWERS for t in out["topk"])
