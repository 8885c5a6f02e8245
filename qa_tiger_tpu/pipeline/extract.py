"""Offline feature-extraction drivers (the reference ``scripts/`` layer).

One CLI, subcommand per stage (see also scripts/extract_features.sh):

  frames     video dir -> 1-fps jpgs per video          (ffmpeg, ref
             scripts/extract_visual_frames/extract_frames.py:7-17)
  audio      video dir -> 16 kHz mono wavs              (ffmpeg, ref
             scripts/extract_audio_cues/extract_audio.py:11-15)
  vggish     wavs -> [60, 128] VGGish embeddings        (ref
             scripts/extract_audio_feat/audio_feature_extractor.py:80-143)
  clip       frame dirs -> [60, 768] CLIP CLS features  (ref
             scripts/extract_clip_feat/extract_frames_ViT-L14@336px.py)
  tome       frame dirs -> [60, 14, 1024] merged tokens (ref
             scripts/extract_ToMe/extract_tome14.py:75-188)
  questions  annots -> per-question_id [1, 768] text features (ref
             scripts/extract_clip_feat/extract_qst_ViT-L14@336px.py)
  prompts    annots -> per-question_id QA-prompt features (ref
             scripts/extract_clip_feat/extract_qaPrompt_ViT-L14@336px.py)

TPU-first design: where the reference encodes ONE frame / ONE question per
forward, these drivers batch a whole video's 60 frames (or a block of
questions) into a single jitted call, and every stage is resumable via
skip-if-output-exists exactly like the reference.

Weights: pass ``--weights model.npz`` (converted checkpoints; see
qa_tiger_tpu.convert) or ``--random-weights`` for pipeline smoke tests.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

TARGET_FRAMES = 60


# ---------------------------------------------------------------------------
# ffmpeg stages
# ---------------------------------------------------------------------------

def extract_frames(video_file: Path, dst_dir: Path, fps: int = 1) -> None:
    """ffmpeg -i video -r 1 dst/%06d.jpg (ref extract_frames.py:7-17)."""
    dst_dir.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", str(video_file),
         "-y", "-r", str(fps), str(dst_dir / "%06d.jpg")],
        check=True)


def extract_audio(video_file: Path, dst_wav: Path, sr: int = 16000) -> None:
    """Demux audio to 16 kHz mono wav (ref extract_audio.py:11-15; ffmpeg
    directly instead of moviepy — same container demux underneath)."""
    dst_wav.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", str(video_file),
         "-y", "-vn", "-ac", "1", "-ar", str(sr), str(dst_wav)],
        check=True)


# ---------------------------------------------------------------------------
# frame selection + image IO
# ---------------------------------------------------------------------------

def select_frame_paths(paths: Sequence[Path], target: int = TARGET_FRAMES
                       ) -> List[Path]:
    """>=target frames: uniform sample via round(linspace); fewer: keep all
    and pad with the last frame (ref extract_frames_ViT...py:125-139)."""
    paths = list(paths)
    n = len(paths)
    if n == 0:
        raise ValueError("no frames")
    if n >= target:
        idx = np.round(np.linspace(0, n - 1, target)).astype(int)
        return [paths[i] for i in idx]
    return paths + [paths[-1]] * (target - n)


def load_image_batch(paths: Sequence[Path], size: int, mean, std
                     ) -> np.ndarray:
    """Resize shorter side -> center crop -> normalize, CLIP/timm style."""
    from PIL import Image

    out = np.empty((len(paths), size, size, 3), np.float32)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((max(size, int(round(w * scale))),
                          max(size, int(round(h * scale)))),
                         Image.BICUBIC)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def _iter_videos(src: Path, dst: Path, suffix: str = ".npy"):
    """Sorted videos with skip-if-done (the reference's resumability rule)."""
    dst.mkdir(parents=True, exist_ok=True)
    for video_dir in sorted(src.iterdir()):
        out_file = dst / (video_dir.name.removesuffix(".wav") + suffix)
        if out_file.exists():
            continue
        yield video_dir, out_file


# ---------------------------------------------------------------------------
# model-backed stages
# ---------------------------------------------------------------------------

def run_vggish(args) -> None:
    import jax
    from scipy.io import wavfile

    from qa_tiger_tpu.ops.mel import SAMPLE_RATE
    from qa_tiger_tpu.pipeline import vggish as V

    params = _load_params(args, default_init=lambda k: V.vggish_init(k))
    embed = jax.jit(V.vggish_embed_seconds)
    for wav_file, out_file in _iter_videos(Path(args.src), Path(args.dst)):
        sr, snd = wavfile.read(str(wav_file))
        snd = np.asarray(snd)
        if snd.ndim == 1:
            snd = snd[:, None]
        snd = V.pad_audio_last_second(snd, sr, args.num_secs)
        wav = snd[: sr * args.num_secs].mean(axis=1) / 32768.0
        if sr != SAMPLE_RATE:
            wav = V._resample(wav, sr, SAMPLE_RATE)
        seconds = wav[: SAMPLE_RATE * args.num_secs].reshape(
            args.num_secs, SAMPLE_RATE).astype(np.float32)
        emb = np.asarray(embed(params, seconds))
        np.save(out_file, emb)
        print(f"{out_file.name}: {emb.shape}")


def run_clip_frames(args) -> None:
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import clip_image as CI

    params = _load_params(
        args, default_init=lambda k: CI.clip_vision_init(k, args.encoder))
    size = CI.vision_config(args.encoder)["input_resolution"]
    encode = jax.jit(lambda p, x: CI.clip_vision_encode(
        p, x, name=args.encoder)[0])
    for frames_dir, out_file in _iter_videos(Path(args.src), Path(args.dst)):
        paths = select_frame_paths(sorted(frames_dir.glob("*.jpg")))
        imgs = load_image_batch(paths, size, CI.CLIP_MEAN, CI.CLIP_STD)
        feats = np.asarray(encode(params, jnp.asarray(imgs)))
        np.save(out_file, feats)
        print(f"{out_file.name}: {feats.shape}")


def run_clip_tokens(args) -> None:
    """Token-level CLIP features: [60, grid*grid, width] patch tokens per
    video (the reference's ViT-B/32 token-level variant,
    scripts/extract_clip_feat/extract_token-level_feat.py)."""
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import clip_image as CI

    params = _load_params(
        args, default_init=lambda k: CI.clip_vision_init(k, args.encoder))
    size = CI.vision_config(args.encoder)["input_resolution"]
    encode = jax.jit(lambda p, x: CI.clip_vision_encode(
        p, x, name=args.encoder)[1])
    for frames_dir, out_file in _iter_videos(Path(args.src), Path(args.dst)):
        paths = select_frame_paths(sorted(frames_dir.glob("*.jpg")))
        imgs = load_image_batch(paths, size, CI.CLIP_MEAN, CI.CLIP_STD)
        tokens = np.asarray(encode(params, jnp.asarray(imgs)))
        np.save(out_file, tokens)
        print(f"{out_file.name}: {tokens.shape}")


def run_tome(args) -> None:
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models import vit as VT

    params = _load_params(
        args, default_init=lambda k: VT.vit_init(k, args.model))
    size = VT.vit_config(args.model)["img_size"]
    rs = [args.r] * args.layers
    encode = jax.jit(lambda p, x: VT.vit_forward(
        p, x, name=args.model, tome_r=rs)["tokens"])
    for frames_dir, out_file in _iter_videos(Path(args.src), Path(args.dst)):
        paths = select_frame_paths(sorted(frames_dir.glob("*.jpg")))
        # timm vit_large_patch16_384 uses inception-style 0.5 normalisation
        imgs = load_image_batch(paths, size, (0.5,) * 3, (0.5,) * 3)
        tokens = np.asarray(encode(params, jnp.asarray(imgs)))
        np.save(out_file, tokens)
        print(f"{out_file.name}: {tokens.shape}")


def _encode_texts(args, texts: List[str], batch: int = 256) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.data.tokenizer import ClipTokenizer
    from qa_tiger_tpu.models import clip_text as CT

    params = _load_params(
        args, default_init=lambda k: CT.clip_text_init(k, args.encoder))
    tok = ClipTokenizer()
    encode = jax.jit(lambda p, t: CT.clip_text_encode(
        p, t, encoder_type=args.encoder)[0])
    out = []
    for i in range(0, len(texts), batch):
        ids = tok(texts[i: i + batch], truncate=True)
        out.append(np.asarray(encode(params, jnp.asarray(ids))))
    return np.concatenate(out) if out else np.zeros((0,))


def run_questions(args, use_prompt: bool = False) -> None:
    from qa_tiger_tpu.data.annotations import substitute_template
    from qa_tiger_tpu.data.prompts import match_prompt

    samples = json.load(open(args.annot))
    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    todo = [s for s in samples
            if not (dst / f"{int(s['question_id'])}.npy").exists()]
    if use_prompt:
        texts = [match_prompt(s["question_content"], s["templ_values"])
                 for s in todo]
    else:
        texts = [substitute_template(s["question_content"], s["templ_values"])
                 for s in todo]
    feats = _encode_texts(args, texts)
    for s, f in zip(todo, feats):
        np.save(dst / f"{int(s['question_id'])}.npy", f[None])
    print(f"encoded {len(todo)} texts -> {dst}")


def _load_params(args, default_init):
    import jax

    if getattr(args, "weights", None):
        from qa_tiger_tpu.training.checkpoint import load_checkpoint

        params, _, _ = load_checkpoint(args.weights)
        return params
    if getattr(args, "random_weights", False):
        return default_init(jax.random.PRNGKey(0))
    raise SystemExit("pass --weights CKPT.npz or --random-weights")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p, weights=True):
        p.add_argument("--src", required=True)
        p.add_argument("--dst", required=True)
        if weights:
            p.add_argument("--weights", default=None)
            p.add_argument("--random-weights", action="store_true")

    p = sub.add_parser("frames")
    common(p, weights=False)
    p.add_argument("--fps", type=int, default=1)
    p = sub.add_parser("audio")
    common(p, weights=False)
    p.add_argument("--sr", type=int, default=16000)
    p = sub.add_parser("vggish")
    common(p)
    p.add_argument("--num-secs", type=int, default=60)
    p = sub.add_parser("clip")
    common(p)
    p.add_argument("--encoder", default="ViT-L/14@336px")
    p = sub.add_parser("clip-tokens")
    common(p)
    p.add_argument("--encoder", default="ViT-B/32")
    p = sub.add_parser("tome")
    common(p)
    p.add_argument("--model", default="vit_large_patch16_384")
    p.add_argument("--r", type=int, default=25)
    p.add_argument("--layers", type=int, default=23)
    p = sub.add_parser("consolidate")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    for name in ("questions", "prompts"):
        p = sub.add_parser(name)
        p.add_argument("--annot", required=True)
        p.add_argument("--dst", required=True)
        p.add_argument("--encoder", default="ViT-L/14@336px")
        p.add_argument("--weights", default=None)
        p.add_argument("--random-weights", action="store_true")

    args = parser.parse_args(argv)
    if args.cmd == "frames":
        src = Path(args.src)
        for video_file in sorted(src.iterdir()):
            if video_file.suffix not in (".mp4", ".avi", ".mkv", ".webm"):
                continue
            dst_dir = Path(args.dst) / video_file.stem
            if dst_dir.exists():
                continue
            extract_frames(video_file, dst_dir, args.fps)
    elif args.cmd == "audio":
        src = Path(args.src)
        for video_file in sorted(src.iterdir()):
            if video_file.suffix not in (".mp4", ".avi", ".mkv", ".webm"):
                continue
            dst_wav = Path(args.dst) / (video_file.stem + ".wav")
            if dst_wav.exists():
                continue
            extract_audio(video_file, dst_wav, args.sr)
    elif args.cmd == "vggish":
        run_vggish(args)
    elif args.cmd == "clip":
        run_clip_frames(args)
    elif args.cmd == "clip-tokens":
        run_clip_tokens(args)
    elif args.cmd == "tome":
        run_tome(args)
    elif args.cmd == "consolidate":
        from qa_tiger_tpu.pipeline.consolidate import consolidate

        out, n = consolidate(args.src, args.dst)
        print(f"packed {n} items -> {out}")
    elif args.cmd == "questions":
        run_questions(args, use_prompt=False)
    elif args.cmd == "prompts":
        run_questions(args, use_prompt=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()
