"""Single-question inference CLI — a serving surface the reference lacks.

The reference can only score whole annotation splits (src/test.py). This
entry answers one question about one video from its extracted features:

    python src/predict.py --config configs/qa-tiger/vitl14.py \
        --weight best.npz --video 00000093 \
        --question "How many instruments are sounding in the video?" [--topk 5]

It tokenizes the question with the CLIP BPE tokenizer, loads the video's
audio/video/patch features from the config's feature directories, runs the
jitted forward once (batch of 1), and prints the top-k answers with
probabilities as one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
sys.path.append(ROOT.as_posix())

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qa_tiger_tpu.data.tokenizer import ClipTokenizer  # noqa: E402
from qa_tiger_tpu.models import build_model  # noqa: E402
from qa_tiger_tpu.parallel import make_mesh  # noqa: E402
from qa_tiger_tpu.training import load_checkpoint  # noqa: E402
from qa_tiger_tpu.training.loop import AVQARunner, merge_params  # noqa: E402
from qa_tiger_tpu.utils import (  # noqa: E402
    enable_compilation_cache,
    load_config_module,
)


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--weight", default="", help="best.npz or torch best.pt")
    ap.add_argument("--question", required=True)
    ap.add_argument("--video", required=True,
                    help="video_id (feature files are <dir>/<video_id>.npy)")
    ap.add_argument("--topk", type=int, default=5)
    return ap.parse_args()


def load_features(cfg, video_id: str) -> dict:
    from qa_tiger_tpu.data.dataset import load_video_features

    feats = load_video_features(cfg.data, video_id, repo_root=ROOT)
    return {k: v[None] for k, v in feats.items()}  # batch of 1


def main():
    enable_compilation_cache()
    args = parse_args()
    cfg = load_config_module(args.config)
    if args.weight:
        cfg["weight"] = args.weight

    # answer vocabulary (ix -> answer) from the config's answer2idx asset
    root = Path(cfg.data.root)
    if not root.is_absolute():
        root = ROOT / root
    vocab = json.loads((root / cfg.data.ans_quelen).read_text())["ans2ix"]
    ix2ans = {int(v): k for k, v in vocab.items()}

    model_cfg, init_fn, forward_fn, frozen = build_model(
        cfg.hyper_params.model_type, cfg.hyper_params.model,
        num_labels=len(vocab))
    platform = cfg.hyper_params.get("platform")
    devices = jax.devices(platform) if platform else jax.devices()
    if platform:
        # pin eager ops (PRNG init, host transfers) to the requested
        # platform too — without this they land on the default backend
        # even though the mesh is elsewhere (same fix as dryrun_multichip)
        jax.config.update("jax_default_device", devices[0])
    runner = AVQARunner(cfg, model_cfg, init_fn, forward_fn, frozen,
                        mesh=make_mesh(n_devices=1, devices=devices),
                        seed=int(cfg.get("seed", 0)))
    clip_weights = cfg.hyper_params.model.get("clip_weights")
    if clip_weights:
        runner.load_clip_text_weights(clip_weights)
    if cfg.get("weight"):
        params, missing, unexpected = load_checkpoint(cfg.weight, runner.params)
        if missing or unexpected:
            print(f"# missing={missing} unexpected={unexpected}",
                  file=sys.stderr)
        runner.load_params(params)

    batch = load_features(cfg, args.video)
    batch["quest"] = ClipTokenizer()(args.question, truncate=True).astype(np.int64)
    # route through the runner so text_ctx EOT validation (and device
    # placement) is identical to the batch eval path
    batch = runner._device_batch(batch)

    params = merge_params(runner.trainable, runner.frozen)
    logits = jax.jit(
        lambda p, b: forward_fn(p, b, runner.model_cfg, train=False)["out"]
    )(params, batch)[0]
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32)))
    top = np.argsort(-probs)[: args.topk]
    print(json.dumps({
        "question": args.question,
        "video": args.video,
        "answer": ix2ans.get(int(top[0]), str(int(top[0]))),
        "topk": [{"answer": ix2ans.get(int(i), str(int(i))),
                  "prob": round(float(probs[i]), 4)} for i in top],
    }))


if __name__ == "__main__":
    main()
