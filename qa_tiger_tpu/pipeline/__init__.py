"""Offline feature-extraction pipeline (the reference's ``scripts/`` layer,
SURVEY.md §2.4), rebuilt TPU-first:

- ``vggish``: audio -> log-mel (batched jnp) -> VGGish conv embedding [T,128]
- ``clip_image``: frames -> CLIP ViT image tower -> [T, 768] CLS features
- ``tome_extract``: frames -> ViT + token-merging -> [T, 14, 1024] patch feats
- ``extract``: CLI drivers that walk a video corpus and write per-video .npy
  caches compatible with the training data layer.

ffmpeg remains the external demuxer (frames at 1 fps, 16 kHz wav), exactly as
in the reference (scripts/extract_visual_frames, scripts/extract_audio_cues).
"""
from qa_tiger_tpu.pipeline.vggish import (
    vggish_init,
    vggish_forward,
    vggish_embed_seconds,
    pad_audio_last_second,
    wavfile_to_examples,
)

__all__ = [
    "vggish_init",
    "vggish_forward",
    "vggish_embed_seconds",
    "pad_audio_last_second",
    "wavfile_to_examples",
]
