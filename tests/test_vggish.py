"""VGGish pipeline tests: mel frontend parity vs the reference numpy code,
conv net shapes, padding rule parity."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available

from qa_tiger_tpu.ops import mel
from qa_tiger_tpu.pipeline import vggish as V


class TestMelFrontend:
    def test_mel_matrix_parity(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        from src.models import vggish as ref

        ours = mel.mel_matrix(num_spectrogram_bins=257)
        theirs = ref.spectrogram_to_mel_matrix(
            num_mel_bins=64, num_spectrogram_bins=257,
            audio_sample_rate=16000, lower_edge_hertz=125.0,
            upper_edge_hertz=7500.0)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)

    def test_log_mel_parity(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        from src.models import vggish as ref

        rng = np.random.default_rng(0)
        wav = rng.standard_normal(16000).astype(np.float32) * 0.1
        ours = np.asarray(mel.log_mel_spectrogram(jnp.asarray(wav)))
        theirs = ref.log_mel_spectrogram(
            wav, audio_sample_rate=16000, log_offset=0.01,
            window_length_secs=0.025, hop_length_secs=0.010,
            num_mel_bins=64, lower_edge_hertz=125, upper_edge_hertz=7500)
        assert ours.shape == theirs.shape == (98, 64)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_examples_parity(self):
        if not reference_available():
            pytest.skip("reference not mounted")
        add_reference_to_path()
        from src.models import vggish as ref

        rng = np.random.default_rng(1)
        wav = rng.standard_normal(16000).astype(np.float32) * 0.1
        ours = np.asarray(mel.waveform_to_examples(jnp.asarray(wav)))
        theirs = np.asarray(ref.waveform_to_examples(wav, 16000))
        assert ours.shape == theirs.shape == (1, 96, 64)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_batched_matches_per_second(self):
        rng = np.random.default_rng(2)
        secs = rng.standard_normal((5, 16000)).astype(np.float32)
        batched = np.asarray(mel.waveform_to_examples(jnp.asarray(secs)))
        for i in range(5):
            single = np.asarray(mel.waveform_to_examples(jnp.asarray(secs[i])))
            np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)


class TestVggishNet:
    def test_shapes_and_jit(self):
        params = V.vggish_init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        secs = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32))
        emb = V.vggish_embed_seconds(params, secs)
        assert emb.shape == (4, 128)
        assert np.all(np.isfinite(np.asarray(emb)))
        assert np.all(np.asarray(emb) >= 0)  # final ReLU

    def test_tf_name_conversion(self):
        flat = {
            "vggish/conv1/weights": np.zeros((3, 3, 1, 64), np.float32),
            "vggish/conv1/biases": np.zeros(64, np.float32),
            "vggish/conv3/conv3_1/weights": np.zeros((3, 3, 128, 256), np.float32),
            "vggish/fc1/fc1_2/biases": np.zeros(4096, np.float32),
        }
        tree = V._from_flat_tf(flat)
        assert tree["conv1"]["weights"].shape == (3, 3, 1, 64)
        assert tree["conv3"]["conv3_1"]["weights"].shape == (3, 3, 128, 256)
        assert tree["fc1"]["fc1_2"]["biases"].shape == (4096,)


class TestPadding:
    def test_pad_rule_parity_mono(self):
        sr = 100
        snd = np.arange(sr * 3, dtype=np.float32)  # 3 s clip
        padded = V.pad_audio_last_second(snd, sr, target_length=5)
        assert padded.shape[0] == sr * 5
        np.testing.assert_array_equal(padded[:300], snd)
        np.testing.assert_array_equal(padded[300:400], snd[-sr:])

    def test_no_pad_when_long_enough(self):
        sr = 100
        snd = np.zeros(sr * 60)
        assert V.pad_audio_last_second(snd, sr, 60) is snd

    def test_wavfile_reader(self, tmp_path):
        from scipy.io import wavfile

        sr = 16000
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(sr * 3) * 3000).astype(np.int16)
        path = tmp_path / "a.wav"
        wavfile.write(path, sr, wav)
        out = V.wavfile_to_examples(path, num_secs=5, inds=range(5))
        assert out.shape == (5, 96, 64)
        assert np.any(out[0] != 0) and np.any(out[2] != 0)
        assert np.all(out[3] == 0)  # past the 3s clip stays zero
