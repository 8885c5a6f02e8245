"""Optional-backend integrations: Grain input pipeline + Orbax checkpoints."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.data import AVQADataset
from qa_tiger_tpu.utils import Box

T, P = 6, 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain")
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        (root / sub).mkdir()
        for v in ("a", "b", "c"):
            np.save(root / sub / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))
    annots = [{"video_id": v, "question_id": i,
               "type": '["Audio", "Counting"]',
               "question_content": "How many?", "templ_values": "[]",
               "anser": "one"}
              for i, v in enumerate(["a", "b", "c", "a", "b", "c", "a"])]
    (root / "train.json").write_text(json.dumps(annots))
    (root / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {"one": 0}, "max_que_len": 24}))
    cfg = Box(dict(type="qa-tiger", data=dict(
        root=str(root), frame_sample_rate=1, train_annot="train.json",
        ans_quelen="answer2idx.json", audio_feat="vggish", video_feat="clip",
        patch_feat="tome", quest_feat=None, prompt_feat=None)))
    return AVQADataset(cfg, "train")


def test_grain_loader_contract(dataset):
    grain = pytest.importorskip("grain")
    from qa_tiger_tpu.data.grain_source import make_grain_loader

    loader = make_grain_loader(dataset, 4, shuffle=True, seed=3)
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # 7 samples / 4
    for b in batches:
        assert b["audio"].shape == (4, T, 16)
        assert b["patch"].shape == (4, T, P, 24)
        assert b["valid"].shape == (4,)
    assert sum(int(b["valid"].sum()) for b in batches) == 7
    # epoch changes the order
    order0 = batches[0]["label"].tolist()
    loader.set_epoch(1)
    order1 = next(iter(loader))["label"].tolist()
    assert len(order0) == len(order1)


def test_orbax_train_state_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from qa_tiger_tpu.training.checkpoint import (
        load_train_state_orbax,
        save_train_state_orbax,
    )

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "opt_state": {"m": jnp.ones((2, 3)) * 0.5},
        "epoch": 3,
        "best_acc": 71.25,
    }
    save_train_state_orbax(state, tmp_path / "ckpt")
    template = {
        "params": {"w": jnp.zeros((2, 3))},
        "opt_state": {"m": jnp.zeros((2, 3))},
        "epoch": 0,
        "best_acc": 0.0,
    }
    restored = load_train_state_orbax(tmp_path / "ckpt", template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["m"]),
                                  np.ones((2, 3)) * 0.5)
    assert restored["epoch"] == 3 and restored["best_acc"] == 71.25
