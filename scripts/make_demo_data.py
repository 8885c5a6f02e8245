#!/usr/bin/env python
"""Generate a self-contained demo corpus from the in-tree MUSIC-AVQA annots.

The real MUSIC-AVQA media (and hence the extracted features, reference
data/feats/*) cannot ship in-repo; this script makes `bash scripts/train.sh
configs/qa-tiger/demo_synth.py` runnable from a clean checkout by

- filtering the in-tree real annotations (data/annots/music_avqa/*.json,
  same files the reference ships) down to the first --videos video_ids,
- splitting the filtered QA pairs into demo train/val/test JSONs with the
  exact annotation schema,
- synthesizing feature files with the real extraction shapes and dtypes:
  VGGish audio [T,128], CLIP ViT-L/14@336px frame features [T,768], and
  ToMe patch features [T,14,1024] (reference feature dirs:
  feats/vggish, feats/clip_feats/1fps, feats/visual_tome14_60).

Throughput and training mechanics are weight/feature-value independent, so
the synthetic features exercise the full pipeline faithfully; only the
achievable accuracy is meaningless.

Usage: python scripts/make_demo_data.py [--root data] [--videos 16] [--t 60]
"""
from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]

FEATS = {
    "feats/vggish": (128,),
    "feats/clip_feats/1fps": (768,),
    "feats/visual_tome14_60": (14, 1024),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=str(ROOT / "data"))
    ap.add_argument("--videos", type=int, default=16)
    ap.add_argument("--t", type=int, default=60, help="frames/seconds per video")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = Path(args.root)
    src = root / "annots" / "music_avqa"
    val = json.loads((src / "music_avqa_val.json").read_text())
    test = json.loads((src / "music_avqa_test.json").read_text())

    videos = sorted({a["video_id"] for a in val})[: args.videos]
    vidset = set(videos)
    pool = [a for a in val if a["video_id"] in vidset]
    test_pool = [a for a in test if a["video_id"] in vidset]
    n_train = max(len(pool) * 7 // 10, 1)
    splits = {
        "train": pool[:n_train],
        "val": pool[n_train:] or pool[:1],
        "test": test_pool or pool[n_train:] or pool[:1],
    }

    demo = root / "annots" / "demo"
    demo.mkdir(parents=True, exist_ok=True)
    for name, annots in splits.items():
        (demo / f"{name}.json").write_text(json.dumps(annots))
        print(f"annots/demo/{name}.json: {len(annots)} QA pairs")
    shutil.copy(src / "answer2idx.json", demo / "answer2idx.json")

    rng = np.random.default_rng(args.seed)
    for rel, shape in FEATS.items():
        d = root / rel
        d.mkdir(parents=True, exist_ok=True)
        for v in videos:
            out = d / f"{v}.npy"
            if not out.exists():
                np.save(out, rng.standard_normal(
                    (args.t, *shape)).astype(np.float32))
        print(f"{rel}: {len(videos)} x {(args.t, *shape)}")
    print(f"demo corpus ready under {root}")


if __name__ == "__main__":
    main()
