"""Consolidated feature shards: packing, reading, and dataset integration."""
import json

import numpy as np
import pytest

from qa_tiger_tpu.data import AVQADataset, BatchLoader
from qa_tiger_tpu.pipeline.consolidate import ShardReader, consolidate, open_if_shard
from qa_tiger_tpu.utils import Box

T, P = 6, 4


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    raw = {}
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        d = root / sub
        d.mkdir()
        raw[sub] = {}
        for v in ("a", "b", "c", "d"):
            arr = rng.standard_normal(shape).astype(np.float32)
            np.save(d / f"{v}.npy", arr)
            raw[sub][v] = arr
    annots = [{"video_id": v, "question_id": i,
               "type": '["Visual", "Location"]',
               "question_content": "Where is it?", "templ_values": "[]",
               "anser": "yes"}
              for i, v in enumerate(["a", "b", "c", "d", "a", "b"])]
    (root / "train.json").write_text(json.dumps(annots))
    (root / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {"yes": 0}, "max_que_len": 24}))
    return root, raw


def test_consolidate_roundtrip(corpus, tmp_path):
    root, raw = corpus
    out_path, n = consolidate(root / "clip", tmp_path / "clip_shard")
    assert n == 4
    reader = ShardReader(tmp_path / "clip_shard")
    assert reader.item_shape == (T, 32)
    for v, arr in raw["clip"].items():
        np.testing.assert_array_equal(reader.get(v), arr)
    np.testing.assert_array_equal(
        reader.get_batch(["c", "a"]), np.stack([raw["clip"]["c"], raw["clip"]["a"]]))


def test_open_if_shard(corpus, tmp_path):
    root, _ = corpus
    assert open_if_shard(root / "clip") is None  # per-file dir
    consolidate(root / "clip", tmp_path / "s")
    assert open_if_shard(tmp_path / "s") is not None


def test_dataset_with_shards_matches_files(corpus, tmp_path):
    root, _ = corpus
    for sub in ("vggish", "clip", "tome"):
        consolidate(root / sub, tmp_path / sub)

    def cfg(base):
        return Box(dict(type="qa-tiger", data=dict(
            root=str(base), frame_sample_rate=1, train_annot="train.json",
            ans_quelen="answer2idx.json", audio_feat="vggish",
            video_feat="clip", patch_feat="tome", quest_feat=None,
            prompt_feat=None)))

    # shard-backed config points at the consolidated dirs
    shard_cfg = cfg(root)
    shard_cfg.data.audio_feat = str(tmp_path / "vggish")
    shard_cfg.data.video_feat = str(tmp_path / "clip")
    shard_cfg.data.patch_feat = str(tmp_path / "tome")
    (tmp_path / "train.json").write_text((root / "train.json").read_text())

    ds_files = AVQADataset(cfg(root), "train")
    ds_shards = AVQADataset(shard_cfg, "train")
    assert all(s is not None for s in ds_shards.shards.values())

    b1 = next(iter(BatchLoader(ds_files, 6, prefetch=0)))
    b2 = next(iter(BatchLoader(ds_shards, 6, prefetch=0)))
    for key in ("audio", "video", "patch", "label"):
        np.testing.assert_array_equal(b1[key], b2[key], err_msg=key)

    # per-sample path too (e.g. frame_sample_rate > 1 falls back to it)
    np.testing.assert_array_equal(ds_files[2]["video"], ds_shards[2]["video"])
