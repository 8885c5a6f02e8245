"""Native C++ .npy batch loader: build, correctness, fallback, and loader
path equivalence (native batch == per-sample python path)."""
import json

import numpy as np
import pytest

from qa_tiger_tpu.data import AVQADataset, BatchLoader
from qa_tiger_tpu.data.native_loader import (
    load_npy_batch,
    native_available,
)
from qa_tiger_tpu.utils import Box


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(6):
        arr = rng.standard_normal((10, 16), dtype=np.float32)
        np.save(d / f"f{i}.npy", arr)
        arrays.append(arr)
    return d, arrays


def test_native_builds():
    assert native_available(), "g++ build of the native loader failed"


def test_batch_matches_numpy(npy_dir):
    d, arrays = npy_dir
    paths = [d / f"f{i}.npy" for i in range(6)]
    out = load_npy_batch(paths, (10, 16))
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_prefix_truncation(npy_dir):
    d, arrays = npy_dir
    paths = [d / "f0.npy"]
    out = load_npy_batch(paths, (4, 16))
    np.testing.assert_array_equal(out[0], arrays[0][:4])


def test_fallback_on_float64(tmp_path):
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    np.save(tmp_path / "d.npy", arr)
    out = load_npy_batch([tmp_path / "d.npy"], (3, 4))
    np.testing.assert_array_equal(out[0], arr.astype(np.float32))


def test_loader_native_path_equivalence(tmp_path):
    rng = np.random.default_rng(1)
    data = tmp_path / "data"
    for sub, shape in [("vggish", (6, 16)), ("clip", (6, 32)),
                       ("tome", (6, 4, 24))]:
        (data / sub).mkdir(parents=True)
        for v in ("a", "b", "c"):
            np.save(data / sub / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))
    annots = [{"video_id": v, "question_id": i,
               "type": '["Audio", "Counting"]',
               "question_content": "How many?", "templ_values": "[]",
               "anser": "one"}
              for i, v in enumerate(["a", "b", "c", "a", "b"])]
    (data / "train.json").write_text(json.dumps(annots))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {"one": 0}, "max_que_len": 24}))

    def cfg(native):
        return Box(dict(type="qa-tiger", data=dict(
            root=str(data), frame_sample_rate=1, train_annot="train.json",
            ans_quelen="answer2idx.json", audio_feat="vggish",
            video_feat="clip", patch_feat="tome", quest_feat=None,
            prompt_feat=None, native_loader=native)))

    b_native = next(iter(BatchLoader(AVQADataset(cfg(True), "train"), 4,
                                     prefetch=0)))
    b_python = next(iter(BatchLoader(AVQADataset(cfg(False), "train"), 4,
                                     prefetch=0)))
    assert AVQADataset(cfg(True), "train").use_native
    for key in ("audio", "video", "patch", "quest", "label", "qtype_label",
                "valid"):
        np.testing.assert_array_equal(b_native[key], b_python[key], err_msg=key)
