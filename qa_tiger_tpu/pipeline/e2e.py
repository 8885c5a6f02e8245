"""End-to-end on-TPU inference: raw media -> answer logits in ONE jitted graph.

The reference is a strictly two-stage system: offline extraction writes .npy
caches which the model later consumes (SURVEY.md intro). On TPU the whole
chain fuses into a single XLA program per video batch:

    raw frames [B,T,336,336,3]u8 --CLIP ViT-L/14---------> video [B,T,768]
    raw frames [B,T,384,384,3]u8 --ToMe ViT-L/16 (577->14)-> patch [B,T,14,1024]
    raw audio  [B,T,16000]f32    --log-mel + VGGish-------> audio [B,T,128]
    question tokens [B,77]i64    --frozen CLIP text tower--> quest/words
                                   \\--- QA-TIGER fusion ---> logits [B,42]

ffmpeg stays the host-side demuxer (frames/PCM in, exactly like the
reference's scripts); everything after the pixel/PCM buffers runs on-device.
This module also provides the extraction-throughput benchmark (frames/sec)
for the BASELINE "end-to-end on-TPU pipeline" configuration.
"""
from __future__ import annotations

from typing import Dict

import jax

from qa_tiger_tpu.models import clip_image, vit
from qa_tiger_tpu.models.qa_tiger import qa_tiger_forward
from qa_tiger_tpu.ops.mel import waveform_to_examples
from qa_tiger_tpu.pipeline.vggish import vggish_forward

Params = dict


def e2e_config(model_cfg: dict,
               clip_encoder: str = "ViT-L/14@336px",
               tome_model: str = "vit_large_patch16_384",
               tome_r: int = 25, tome_layers: int = 23) -> dict:
    return dict(model=model_cfg, clip_encoder=clip_encoder,
                tome_model=tome_model,
                tome_r=[tome_r] * tome_layers)


def encode_media(params: Params, clip_frames: jax.Array,
                 tome_frames: jax.Array, audio_pcm: jax.Array,
                 cfg: dict) -> Dict[str, jax.Array]:
    """Raw (normalized) media -> the three feature streams.

    clip_frames: [B, T, H, W, 3] CLIP-normalized; tome_frames: [B, T, H', W',
    3] inception-normalized; audio_pcm: [B, T, sample_rate] mono [-1, 1].
    """
    B, T = clip_frames.shape[:2]
    flat_clip = clip_frames.reshape((B * T,) + clip_frames.shape[2:])
    video, _ = clip_image.clip_vision_encode(
        params["clip_vision"], flat_clip, name=cfg["clip_encoder"])
    video = video.reshape(B, T, -1)

    flat_tome = tome_frames.reshape((B * T,) + tome_frames.shape[2:])
    patch = vit.vit_forward(params["tome_vit"], flat_tome,
                            name=cfg["tome_model"],
                            tome_r=cfg["tome_r"])["tokens"]
    patch = patch.reshape(B, T, patch.shape[-2], patch.shape[-1])

    mel = waveform_to_examples(audio_pcm.reshape(B * T, -1))  # [B*T,1,96,64]
    audio = vggish_forward(params["vggish"], mel[:, 0]).reshape(B, T, -1)
    return {"video": video, "patch": patch, "audio": audio}


def e2e_forward(params: Params, clip_frames: jax.Array,
                tome_frames: jax.Array, audio_pcm: jax.Array,
                quest_tokens: jax.Array, cfg: dict) -> jax.Array:
    """Raw media + tokenized question -> answer logits (jittable)."""
    batch = encode_media(params, clip_frames, tome_frames, audio_pcm, cfg)
    batch["quest"] = quest_tokens
    return qa_tiger_forward(params["qa_tiger"], batch, cfg["model"],
                            train=False)["out"]


def e2e_init(key: jax.Array, cfg: dict) -> Params:
    """Random towers for smoke tests / benchmarks; real use loads converted
    CLIP / timm / VGGish / best.pt checkpoints into the same tree."""
    from qa_tiger_tpu.models.qa_tiger import qa_tiger_init
    from qa_tiger_tpu.pipeline.vggish import vggish_init

    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "clip_vision": clip_image.clip_vision_init(k1, cfg["clip_encoder"]),
        "tome_vit": vit.vit_init(k2, cfg["tome_model"]),
        "vggish": vggish_init(k3),
        "qa_tiger": qa_tiger_init(k4, cfg["model"]),
    }
