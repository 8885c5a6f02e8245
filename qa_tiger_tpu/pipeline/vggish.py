"""VGGish audio embedder: log-mel frontend + conv net, JAX.

The reference runs TF-Slim VGGish inside a TF1 session per file
(reference: scripts/extract_audio_feat/vggish_slim.py:62-90,
audio_feature_extractor.py:80-143). Here the net is a jitted JAX function
that embeds a whole video's 60 one-second patches in one batch on the TPU.

Architecture (vggish_slim.py:77-90): 3x3 SAME convs with ReLU —
conv1(64) pool, conv2(128) pool, conv3/conv3_{1,2}(256) pool,
conv4/conv4_{1,2}(512) pool — flatten, fc1/fc1_{1,2}(4096), fc2(128).
Input [B, 96, 64] log-mel patches -> [B, 128] embeddings.

Parameter tree mirrors the TF checkpoint variable names
(``vggish/conv1/weights`` -> params['conv1']['weights'], HWIO conv layout,
[in, out] fc layout) so the released ``vggish_model.ckpt`` converts
mechanically (see ``load_tf_checkpoint``). Host-side helpers reproduce the
extractor's pad-with-last-second rule (audio_feature_extractor.py:29-61) and
the per-second wavfile reader (src/models/vggish.py:94-129).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qa_tiger_tpu.ops.mel import SAMPLE_RATE, waveform_to_examples

Params = dict

INIT_STDDEV = 0.01  # vggish_params.py:44

_CONV_LAYERS = [
    ("conv1", 1, 64, False),
    ("conv2", 64, 128, False),
    ("conv3", 128, 256, True),
    ("conv4", 256, 512, True),
]


def vggish_init(key: jax.Array) -> Params:
    """Truncated-normal(0.01) weights / zero biases like TF-Slim's init."""

    def trunc(k, shape):
        return INIT_STDDEV * jax.random.truncated_normal(k, -2.0, 2.0, shape)

    keys = jax.random.split(key, 16)
    ki = iter(keys)
    params: Params = {}
    for name, cin, cout, repeated in _CONV_LAYERS:
        if repeated:
            params[name] = {
                f"{name}_1": {"weights": trunc(next(ki), (3, 3, cin, cout)),
                              "biases": jnp.zeros((cout,))},
                f"{name}_2": {"weights": trunc(next(ki), (3, 3, cout, cout)),
                              "biases": jnp.zeros((cout,))},
            }
        else:
            params[name] = {"weights": trunc(next(ki), (3, 3, cin, cout)),
                            "biases": jnp.zeros((cout,))}
    params["fc1"] = {
        "fc1_1": {"weights": trunc(next(ki), (6 * 4 * 512, 4096)),
                  "biases": jnp.zeros((4096,))},
        "fc1_2": {"weights": trunc(next(ki), (4096, 4096)),
                  "biases": jnp.zeros((4096,))},
    }
    params["fc2"] = {"weights": trunc(next(ki), (4096, 128)),
                     "biases": jnp.zeros((128,))}
    return params


def _conv(p: Params, x: jax.Array) -> jax.Array:
    # log-mel input stays fp32; under bf16 params run the conv in the param
    # dtype (the mel frontend's dynamic range needs fp32, the conv net's
    # doesn't)
    w = p["weights"]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["biases"])


def _pool(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


def vggish_forward(params: Params, patches: jax.Array) -> jax.Array:
    """[B, 96, 64] log-mel patches -> [B, 128] embeddings."""
    x = patches[..., None]  # NHWC
    x = _pool(_conv(params["conv1"], x))
    x = _pool(_conv(params["conv2"], x))
    x = _conv(params["conv3"]["conv3_1"], x)
    x = _pool(_conv(params["conv3"]["conv3_2"], x))
    x = _conv(params["conv4"]["conv4_1"], x)
    x = _pool(_conv(params["conv4"]["conv4_2"], x))
    x = x.reshape(x.shape[0], -1)  # TF flatten: H*W*C order
    x = jax.nn.relu(x @ params["fc1"]["fc1_1"]["weights"]
                    + params["fc1"]["fc1_1"]["biases"])
    x = jax.nn.relu(x @ params["fc1"]["fc1_2"]["weights"]
                    + params["fc1"]["fc1_2"]["biases"])
    x = jax.nn.relu(x @ params["fc2"]["weights"] + params["fc2"]["biases"])
    return x


@jax.jit
def vggish_embed_seconds(params: Params, seconds: jax.Array) -> jax.Array:
    """[T, sample_rate] one-second waveforms -> [T, 128] embeddings:
    the fused on-TPU replacement for the reference's per-file TF session."""
    patches = waveform_to_examples(seconds)          # [T, 1, 96, 64]
    return vggish_forward(params, patches[:, 0])


# ---------------------------------------------------------------------------
# Host-side audio handling
# ---------------------------------------------------------------------------

def pad_audio_last_second(snd: np.ndarray, sr: int,
                          target_length: int = 60) -> np.ndarray:
    """Tile the final second until the clip reaches ``target_length`` seconds
    (ref audio_feature_extractor.py:29-61)."""
    if snd.shape[0] >= sr * target_length:
        return snd
    padding_needed = target_length - snd.shape[0] / sr
    last = snd[-sr:] if snd.shape[0] > sr else snd
    repeats = int(np.ceil(padding_needed))
    reps = (repeats, 1) if snd.ndim > 1 else repeats
    padding = np.tile(last, reps)[: int(padding_needed * sr)]
    return np.concatenate([snd, padding], axis=0)


def wavfile_to_examples(wav_file: str | Path, num_secs: int,
                        inds=None) -> np.ndarray:
    """WAV -> [num_secs, 96, 64] per-second log-mel patches
    (ref src/models/vggish.py:94-129; missing/short seconds stay zero)."""
    from scipy.io import wavfile

    sr, snd = wavfile.read(str(wav_file))
    wav_data = np.asarray(snd)[: sr * num_secs] / 32768.0
    if wav_data.ndim > 1:
        wav_data = np.mean(wav_data, axis=1)
    if sr != SAMPLE_RATE:
        wav_data = _resample(wav_data, sr, SAMPLE_RATE)
        sr = SAMPLE_RATE
    if inds is None:
        inds = range(num_secs)
    out = np.zeros((num_secs, 96, 64), np.float32)
    for i in inds:
        seg = wav_data[i * sr:(i + 1) * sr]
        if seg.shape[0] < sr:
            break
        out[i] = np.asarray(waveform_to_examples(jnp.asarray(seg)))[0]
    return out


def _resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample (scipy); resampy is not in this image."""
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g)


# ---------------------------------------------------------------------------
# TF checkpoint conversion
# ---------------------------------------------------------------------------

def load_tf_checkpoint(ckpt_path: str) -> Params:
    """Convert the released ``vggish_model.ckpt`` (TF-Slim variable names)
    into this module's param tree. Requires tensorflow to read the TF
    checkpoint format; raises a clear error when it is unavailable."""
    try:
        from tensorflow.python.training import py_checkpoint_reader  # type: ignore
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "reading vggish_model.ckpt requires tensorflow; alternatively "
            "convert it elsewhere to an .npz of {var_name: array} and load "
            "with load_npz_checkpoint") from exc
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    flat = {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}
    return _from_flat_tf(flat)


def load_npz_checkpoint(npz_path: str) -> Params:
    with np.load(npz_path) as data:
        return _from_flat_tf({k: data[k] for k in data.files})


def _from_flat_tf(flat: Dict[str, np.ndarray]) -> Params:
    params: Params = {}
    for name, value in flat.items():
        parts = name.replace("vggish/", "").split("/")
        node = params
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return params
