"""Dataset + loader tests over a synthetic feature corpus."""
import json

import numpy as np
import pytest

from qa_tiger_tpu.data import AVQADataset, BatchLoader
from qa_tiger_tpu.data.annotations import substitute_template
from qa_tiger_tpu.utils import Box

T, P = 60, 14
VIDEOS = [f"vid{i:04d}" for i in range(7)]
ANSWERS = ["one", "two", "yes", "no"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 128)), ("clip", (T, 768)),
                       ("tome", (T, P, 1024))]:
        d = root / sub
        d.mkdir()
        for v in VIDEOS:
            np.save(d / f"{v}.npy", rng.standard_normal(shape).astype(np.float32))
    annots = []
    types = ['["Audio", "Counting"]', '["Visual", "Location"]',
             '["Audio-Visual", "Temporal"]']
    for i in range(19):
        annots.append({
            "video_id": VIDEOS[i % len(VIDEOS)],
            "question_id": i,
            "type": types[i % 3],
            "question_content": "How many <Object> are in the video?",
            "templ_values": '["flutes"]',
            "anser": ANSWERS[i % len(ANSWERS)],
        })
    (root / "train.json").write_text(json.dumps(annots))
    (root / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)}, "max_que_len": 24}))
    return root


def make_cfg(root):
    return Box(dict(
        type="qa-tiger",
        data=dict(
            root=str(root), frame_sample_rate=1,
            train_annot="train.json", ans_quelen="answer2idx.json",
            audio_feat="vggish", video_feat="clip", patch_feat="tome",
            quest_feat=None, prompt_feat=None,
        ),
    ))


def test_sample_shapes(corpus):
    ds = AVQADataset(make_cfg(corpus), "train")
    item = ds[0]
    assert item["audio"].shape == (T, 128)
    assert item["video"].shape == (T, 768)
    assert item["patch"].shape == (T, P, 1024)
    assert item["quest"].shape == (77,)
    assert item["quest"].dtype == np.int64
    assert 0 <= item["label"] < 4
    assert item["qtype_label"] in (0, 3, 8)


def test_loader_fixed_shapes_and_mask(corpus):
    ds = AVQADataset(make_cfg(corpus), "train")
    loader = BatchLoader(ds, batch_size=8, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3  # 19 samples / 8
    for b in batches:
        assert b["audio"].shape == (8, T, 128)
        assert b["valid"].shape == (8,)
    assert batches[-1]["valid"].sum() == 19 - 16
    assert sum(b["valid"].sum() for b in batches) == 19


def test_loader_shuffle_reproducible_and_epoch_varying(corpus):
    ds = AVQADataset(make_cfg(corpus), "train")
    l1 = BatchLoader(ds, batch_size=19, shuffle=True, seed=5)
    l2 = BatchLoader(ds, batch_size=19, shuffle=True, seed=5)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["label"], b2["label"])
    l2.set_epoch(1)
    b3 = next(iter(l2))
    assert not np.array_equal(b1["label"], b3["label"])


def test_sharding_disjoint_and_complete(corpus):
    ds = AVQADataset(make_cfg(corpus), "train")
    seen = []
    for shard in range(2):
        loader = BatchLoader(ds, batch_size=4, shuffle=False,
                             shard_id=shard, num_shards=2)
        for b in loader:
            seen.extend(np.asarray(b["name"])[b["valid"]].tolist())
    assert len(seen) == 19


def test_frame_sample_rate(corpus):
    cfg = make_cfg(corpus)
    cfg.data.frame_sample_rate = 2
    ds = AVQADataset(cfg, "train")
    assert ds[0]["video"].shape == (T // 2, 768)
    assert ds[0]["patch"].shape == (T // 2, P, 1024)


def test_template_substitution():
    q = "How many <Object> are in the video?"
    assert substitute_template(q, '["flutes"]') == "How many flutes are in the video?"
    assert substitute_template(
        "Where is the <FL> <Object>?", '["left", "piano"]'
    ) == "Where is the left piano?"
    assert substitute_template("Is there a sound?", "[]") == "Is there a sound?"


def test_load_video_features_shared_contract(corpus):
    """The single feature-loading contract used by the dataset, predict.py
    and serve.py: per-key dirs, fp32, frame_sample_rate subsampling of the
    visual streams only."""
    from qa_tiger_tpu.data.dataset import load_video_features

    cfg = make_cfg(corpus)
    feats = load_video_features(cfg.data, VIDEOS[0])
    assert set(feats) == {"audio", "video", "patch"}
    assert feats["audio"].shape == (T, 128)
    assert feats["video"].shape == (T, 768)
    assert feats["patch"].shape == (T, P, 1024)
    assert all(v.dtype == np.float32 for v in feats.values())

    cfg2 = make_cfg(corpus)
    cfg2.data.frame_sample_rate = 2
    f2 = load_video_features(cfg2.data, VIDEOS[0])
    assert f2["video"].shape == (T // 2, 768)
    assert f2["patch"].shape == (T // 2, P, 1024)
    assert f2["audio"].shape == (T, 128)  # audio is NOT subsampled
    np.testing.assert_array_equal(f2["video"], feats["video"][::2])
