"""Simulated 2-process (multi-host) paths.

Real multi-host needs jax.distributed; here the per-process logic is
simulated in one process: src/train.py's per-host loader construction
(process_count/index monkeypatched) and the eval contract that per-shard
counters summed across hosts equal the single-process whole-dataset pass —
the reference's dist.all_reduce(SUM) semantics (src/trainutils.py:355-363).
"""
import json

import numpy as np
import pytest

import jax

from qa_tiger_tpu.data import AVQADataset, BatchLoader
from qa_tiger_tpu.models.qa_tiger import (
    FROZEN_PREFIXES,
    qa_tiger_config,
    qa_tiger_forward,
    qa_tiger_init,
)
from qa_tiger_tpu.parallel import make_mesh
from qa_tiger_tpu.training.loop import AVQARunner
from qa_tiger_tpu.utils import Box

import qa_tiger_tpu.models.clip_text as ct

ct.CLIP_TEXT_CONFIGS.setdefault(
    "tiny-test", dict(width=32, heads=4, layers=2, embed_dim=32))

T, P = 12, 4
TINY = dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
            topK=2, num_experts=4, encoder_type="tiny-test")
ANSWERS = ["one", "two", "yes", "no"]
N_SAMPLES = 19


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_corpus")
    rng = np.random.default_rng(0)
    videos = [f"vid{i:03d}" for i in range(5)]
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        d = root / sub
        d.mkdir()
        for v in videos:
            np.save(d / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))
    types = ['["Audio", "Counting"]', '["Visual", "Location"]',
             '["Audio-Visual", "Temporal"]']
    annots = [{
        "video_id": videos[i % len(videos)],
        "question_id": i,
        "type": types[i % 3],
        "question_content": "How many <Object> are there?",
        "templ_values": '["flutes"]',
        "anser": ANSWERS[i % len(ANSWERS)],
    } for i in range(N_SAMPLES)]
    for split in ("train", "valid", "test"):
        (root / f"{split}.json").write_text(json.dumps(annots))
    (root / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)}, "max_que_len": 24}))
    return root


def full_cfg(root):
    return Box(dict(
        type="qa-tiger", mode="train", debug=False, log_interval=100,
        epochs=1, seed=7, num_labels=4,
        data=dict(
            root=str(root), frame_sample_rate=1, batch_size=8,
            eval_batch_size=8,
            train_annot="train.json", valid_annot="valid.json",
            test_annot="test.json", ans_quelen="answer2idx.json",
            audio_feat="vggish", video_feat="clip", patch_feat="tome",
            quest_feat=None, prompt_feat=None,
        ),
        hyper_params=dict(
            model=dict(**TINY),
            optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0,
                       encoder_lr=None),
            sched=dict(name="StepLR", step_size=8, gamma=0.1, mode="min",
                       factor=0.5, patience=5),
        ),
    ))


def test_make_loaders_splits_batch_per_process(corpus, monkeypatch):
    """src/train.py make_loaders under a simulated 2-host world: per-host
    loaders get batch_size // 2 and disjoint strided shards
    (reference counterpart: DistributedSampler + per-rank batch split,
    src/trainutils.py:191-198)."""
    # load by path: `import src.train` would resolve to the REFERENCE's src
    # package when an oracle test imported it first in the same session
    import importlib.util
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "qa_mh_train", repo / "src" / "train.py")
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)

    cfg = full_cfg(corpus)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    seen = []
    lens = []
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        loaders = train_mod.make_loaders(cfg, mesh=None)
        train_loader = loaders["train"]
        assert train_loader.batch_size == cfg.data.batch_size // 2
        lens.append(len(train_loader))
        for b in train_loader:
            seen.extend(np.asarray(b["qid"])[b["valid"]].tolist())
    # disjoint and complete across the two simulated hosts
    assert len(seen) == N_SAMPLES
    assert len(set(seen)) == N_SAMPLES
    assert lens[0] == lens[1]  # equal step counts -> no host desync


def test_sharded_eval_counters_sum_to_global(corpus):
    """Two per-host eval loaders, counters summed host-side, must equal the
    single-process whole-dataset eval — the all_reduce(SUM) contract."""
    cfg = full_cfg(corpus)
    # gather_mode="paper": the reference's batch-rotated expert gather makes
    # outputs depend on batch composition, so only the batch-decoupled mode
    # can satisfy the exact shard-sum == global contract (the torch reference
    # under DDP has the same composition-dependence).
    model_cfg = qa_tiger_config(num_labels=4, gather_mode="paper", **TINY)
    mesh = make_mesh(1, devices=jax.devices("cpu"))
    runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                        FROZEN_PREFIXES, mesh=mesh, seed=0)
    ds = AVQADataset(cfg, mode="test")

    single = BatchLoader(ds, 8, shuffle=False)
    _, cor_g, tot_g, cor9_g, tot9_g = runner._run_eval(single, debug=False)

    cor = tot = 0
    cor9 = np.zeros(9, np.int64)
    tot9 = np.zeros(9, np.int64)
    for rank in (0, 1):
        shard_loader = BatchLoader(ds, 4, shuffle=False,
                                   shard_id=rank, num_shards=2)
        _, c, t, c9, t9 = runner._run_eval(shard_loader, debug=False)
        cor += c
        tot += t
        cor9 += np.asarray(c9)
        tot9 += np.asarray(t9)

    assert (cor, tot) == (cor_g, tot_g)
    np.testing.assert_array_equal(cor9, np.asarray(cor9_g))
    np.testing.assert_array_equal(tot9, np.asarray(tot9_g))
    assert tot == N_SAMPLES
