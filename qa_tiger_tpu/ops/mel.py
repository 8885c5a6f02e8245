"""Log-mel spectrogram frontend (VGGish flavour), batched jnp.

Numerically equivalent to the reference's numpy implementation
(reference: src/models/vggish.py:148-353 — stride-tricks framing, periodic
Hann window, rFFT magnitude, HTK mel filterbank with the DC bin zeroed,
log(mel + 0.01)) but expressed as one batched XLA computation: every second of
audio in the batch is framed/transformed at once, so a 60 s clip is a single
[60, 98, 400] -> rFFT -> [60, 96, 64] pipeline on the accelerator instead of
60 python-loop iterations.

VGGish constants: 16 kHz mono, 25 ms window (400 samples), 10 ms hop (160),
512-point FFT, 64 mel bins over 125-7500 Hz, log offset 0.01, 0.96 s example
windows (96 frames) with zero overlap.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW_SECONDS = 0.025
STFT_HOP_SECONDS = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SECONDS = 0.96
EXAMPLE_HOP_SECONDS = 0.96

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz):
    """HTK mel scale (ref src/models/vggish.py:236-241)."""
    return _MEL_HIGH_FREQUENCY_Q * np.log(
        1.0 + (np.asarray(frequencies_hertz, dtype=np.float64)
               / _MEL_BREAK_FREQUENCY_HERTZ))


@functools.lru_cache()
def mel_matrix(num_mel_bins: int = NUM_MEL_BINS,
               num_spectrogram_bins: int = 257,
               audio_sample_rate: int = SAMPLE_RATE,
               lower_edge_hertz: float = MEL_MIN_HZ,
               upper_edge_hertz: float = MEL_MAX_HZ) -> np.ndarray:
    """[num_spectrogram_bins, num_mel_bins] triangular filterbank, DC zeroed
    (ref spectrogram_to_mel_matrix, src/models/vggish.py:244-321)."""
    nyquist = audio_sample_rate / 2.0
    if not (0.0 <= lower_edge_hertz < upper_edge_hertz <= nyquist):
        raise ValueError("bad mel band edges")
    spec_mel = hertz_to_mel(np.linspace(0.0, nyquist, num_spectrogram_bins))
    band_edges = np.linspace(hertz_to_mel(lower_edge_hertz),
                             hertz_to_mel(upper_edge_hertz),
                             num_mel_bins + 2)
    lower = band_edges[:-2][None, :]
    center = band_edges[1:-1][None, :]
    upper = band_edges[2:][None, :]
    lower_slope = (spec_mel[:, None] - lower) / (center - lower)
    upper_slope = (upper - spec_mel[:, None]) / (upper - center)
    weights = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0  # HTK excludes the DC bin
    return weights.astype(np.float32)


def periodic_hann(window_length: int) -> np.ndarray:
    """Period-N raised cosine (ref src/models/vggish.py:178-198)."""
    return (0.5 - 0.5 * np.cos(2 * np.pi / window_length
                               * np.arange(window_length))).astype(np.float32)


def stft_params(sample_rate: int = SAMPLE_RATE):
    window = int(round(sample_rate * STFT_WINDOW_SECONDS))
    hop = int(round(sample_rate * STFT_HOP_SECONDS))
    fft_length = 2 ** int(np.ceil(np.log(window) / np.log(2.0)))
    return window, hop, fft_length


def log_mel_spectrogram(waveform: jnp.ndarray,
                        sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """[..., num_samples] -> [..., num_frames, 64] log-mel frames.

    Batched over any leading dims; no zero padding (incomplete tail frames
    dropped), matching the reference ``frame`` semantics.
    """
    window, hop, fft_length = stft_params(sample_rate)
    num_samples = waveform.shape[-1]
    num_frames = 1 + int(np.floor((num_samples - window) / hop))
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(window)[None, :])                 # [F, W]
    frames = waveform[..., idx]                          # [..., F, W]
    frames = frames * jnp.asarray(periodic_hann(window))
    spec = jnp.abs(jnp.fft.rfft(frames, fft_length, axis=-1))
    mel = spec @ jnp.asarray(mel_matrix(
        num_spectrogram_bins=fft_length // 2 + 1,
        audio_sample_rate=sample_rate))
    return jnp.log(mel + LOG_OFFSET)


def waveform_to_examples(waveform: jnp.ndarray,
                         sample_rate: int = SAMPLE_RATE) -> jnp.ndarray:
    """[..., num_samples] -> [..., num_examples, 96, 64] log-mel patches
    (ref waveform_to_examples, src/models/vggish.py:44-92; resampling to
    16 kHz must happen host-side before calling)."""
    log_mel = log_mel_spectrogram(waveform, sample_rate)
    feat_rate = 1.0 / STFT_HOP_SECONDS
    win = int(round(EXAMPLE_WINDOW_SECONDS * feat_rate))
    hop = int(round(EXAMPLE_HOP_SECONDS * feat_rate))
    num_frames = log_mel.shape[-2]
    num_examples = 1 + int(np.floor((num_frames - win) / hop))
    idx = np.arange(num_examples)[:, None] * hop + np.arange(win)[None, :]
    return log_mel[..., idx, :]
