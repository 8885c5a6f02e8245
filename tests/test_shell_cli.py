"""Shell CLI parity (scripts/train.sh) and frozen-tower weight loading."""
import json
import subprocess
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parents[1]
T, P = 8, 3
ANSWERS = ["one", "two"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("shell")
    data = root / "data"
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        (data / sub).mkdir(parents=True)
        for v in ("a", "b", "c"):
            np.save(data / sub / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))

    def annots(n, start=0):
        return [{"video_id": ["a", "b", "c"][(start + i) % 3],
                 "question_id": start + i,
                 "type": '["Audio", "Counting"]',
                 "question_content": "How many?", "templ_values": "[]",
                 "anser": ANSWERS[i % 2]} for i in range(n)]

    (data / "train.json").write_text(json.dumps(annots(8)))
    (data / "val.json").write_text(json.dumps(annots(4, 50)))
    (data / "test.json").write_text(json.dumps(annots(4, 90)))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)}, "max_que_len": 24}))

    cfg = root / "tiny.py"
    cfg.write_text(f"""
import qa_tiger_tpu.models.clip_text as _ct
_ct.CLIP_TEXT_CONFIGS.setdefault('tiny-sh', dict(width=32, heads=4, layers=1,
                                                 embed_dim=32))
config = dict(
    type='qa-tiger', seed=1, epochs=1, num_labels={len(ANSWERS)},
    log_interval=100, output_dir='{(root / 'out').as_posix()}', weight='',
    debug=True,
    data=dict(root='{data.as_posix()}', img_size=336, batch_size=4,
              eval_batch_size=4, num_workers=0, frame_sample_rate=1,
              train_annot='train.json', valid_annot='val.json',
              test_annot='test.json', test_annots=None,
              ans_quelen='answer2idx.json', quest_feat=None,
              audio_feat='vggish', video_feat='clip', patch_feat='tome',
              prompt_feat=None),
    hyper_params=dict(gpus='0', platform='cpu', model_type='QA-TIGER_tiny',
        model=dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
                   topK=2, num_experts=3, encoder_type='tiny-sh'),
        optim=dict(lr=1e-3, encoder_lr=None, min_lr=1e-7, weight_decay=0,
                   betas=(0.95, 0.999)),
        sched=dict(name='StepLR', mode='min', gamma=0.1, step_size=8,
                   factor=0.5, patience=5, verbose=True, warmup_epochs=1)),
)
""")
    return root


def test_train_sh(workdir):
    """bash scripts/train.sh CONFIG DEVICE runs the debug-mode epoch."""
    import os

    env = dict(os.environ)
    # fast interpreter start (see CLAUDE.md) + CPU mesh via the config's
    # hyper_params.platform knob
    plats = env.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        env["JAX_PLATFORMS"] = plats + ",cpu"
    elif not plats:
        env["JAX_PLATFORMS"] = "cpu"
    # tiny 1-layer smoke model: skip XLA's expensive optimization passes —
    # same numerics, much cheaper compile on this 1-core host (the smoke
    # tests previously ran within ~10% of their timeout under suite
    # contention)
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    result = subprocess.run(
        ["bash", "scripts/train.sh", str(workdir / "tiny.py"), "0"],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env)
    combined = result.stdout + result.stderr
    assert result.returncode == 0, combined[-3000:]
    assert "training epoch 1" in combined
    assert "accuracy" in combined


def test_test_sh(workdir, tmp_path):
    """bash scripts/test.sh CONFIG DEVICE WEIGHT OUT evaluates a checkpoint.

    test.sh forces --n_experts 7 --topK 7 like the reference; the tiny config
    here uses 3 experts, so the override must visibly take effect (the model
    builds with 7 experts from random init via strict=False load).
    """
    import os

    import qa_tiger_tpu.models.clip_text as ct

    ct.CLIP_TEXT_CONFIGS.setdefault(
        "tiny-sh", dict(width=32, heads=4, layers=1, embed_dim=32))
    from qa_tiger_tpu.models.qa_tiger import qa_tiger_config, qa_tiger_init
    from qa_tiger_tpu.training import save_checkpoint

    cfg = qa_tiger_config(d_model=32, video_dim=32, patch_dim=24,
                          audio_dim=16, topK=7, num_experts=7,
                          num_labels=len(ANSWERS), encoder_type="tiny-sh")
    params = qa_tiger_init(jax.random.PRNGKey(0), cfg)
    weight = tmp_path / "best.npz"
    save_checkpoint(params, weight)

    env = dict(os.environ)
    plats = env.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        env["JAX_PLATFORMS"] = plats + ",cpu"
    elif not plats:
        env["JAX_PLATFORMS"] = "cpu"
    # tiny 1-layer smoke model: skip XLA's expensive optimization passes —
    # same numerics, much cheaper compile on this 1-core host (the smoke
    # tests previously ran within ~10% of their timeout under suite
    # contention)
    env.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
    out_dir = tmp_path / "eval"
    result = subprocess.run(
        ["bash", "scripts/test.sh", str(workdir / "tiny.py"), "0",
         str(weight), str(out_dir)],
        cwd=REPO, capture_output=True, text=True, timeout=900, env=env)
    combined = result.stdout + result.stderr
    assert result.returncode == 0, combined[-3000:]
    results = list(out_dir.glob("*_result.txt"))
    assert results and "Total avg" in results[0].read_text()


def test_load_clip_text_weights(tmp_path):
    import qa_tiger_tpu.models.clip_text as ct

    ct.CLIP_TEXT_CONFIGS.setdefault(
        "tiny-sh2", dict(width=32, heads=4, layers=1, embed_dim=32))
    from qa_tiger_tpu.models.clip_text import clip_text_init
    from qa_tiger_tpu.models.qa_tiger import (
        FROZEN_PREFIXES,
        qa_tiger_config,
        qa_tiger_forward,
        qa_tiger_init,
    )
    from qa_tiger_tpu.parallel import make_mesh
    from qa_tiger_tpu.training import save_checkpoint
    from qa_tiger_tpu.training.loop import AVQARunner
    from qa_tiger_tpu.utils import Box

    tower = clip_text_init(jax.random.PRNGKey(42), "tiny-sh2")
    save_checkpoint({"quest_encoder": tower}, tmp_path / "clip.npz",
                    exclude_prefixes=())

    cfg = Box(dict(type="qa-tiger", debug=False, log_interval=100, epochs=1,
                   hyper_params=dict(
                       model=dict(),
                       optim=dict(lr=1e-3, betas=(0.95, 0.999),
                                  weight_decay=0),
                       sched=dict(name="StepLR", step_size=8, gamma=0.1))))
    model_cfg = qa_tiger_config(
        d_model=32, video_dim=32, patch_dim=24, audio_dim=16, topK=2,
        num_experts=3, num_labels=4, encoder_type="tiny-sh2")
    runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                        FROZEN_PREFIXES,
                        mesh=make_mesh(1, devices=jax.devices("cpu")),
                        seed=0)
    runner.load_clip_text_weights(str(tmp_path / "clip.npz"))
    got = np.asarray(
        runner.frozen["quest_encoder"]["token_embedding"]["weight"])
    np.testing.assert_array_equal(
        got, np.asarray(tower["token_embedding"]["weight"]))
