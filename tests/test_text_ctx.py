"""Opt-in text_ctx trimmed text tower (serving-speed mode).

With the causal mask, trimming the token sequence to text_ctx is
mathematically identical for every kept position — including the EOT argmax
pooling read — whenever EOT < text_ctx (masked keys contribute exp(-inf)=0).
Numerically it agrees up to fp32 reduction-order: XLA tiles a 77-key and a
32-key contraction differently (~3e-5 relative). The words branch
intentionally loses the post-EOT padding keys (a documented deviation; see
models/qa_tiger.encode_question).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import qa_tiger_tpu.models.clip_text as ct
from qa_tiger_tpu.models.qa_tiger import (
    FROZEN_PREFIXES,
    encode_question,
    qa_tiger_config,
    qa_tiger_forward,
    qa_tiger_init,
)

ct.CLIP_TEXT_CONFIGS.setdefault(
    "tiny-test", dict(width=32, heads=4, layers=2, embed_dim=32))

TINY = dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
            topK=2, num_experts=4, encoder_type="tiny-test")


def _tokens(rng, b, eot_max, length=77):
    """Random token rows padded with zeros after an EOT at position < eot_max."""
    out = np.zeros((b, length), np.int32)
    for i in range(b):
        n = rng.integers(3, eot_max - 1)
        out[i, :n] = rng.integers(1, 400, n)
        out[i, n] = 49407  # EOT: the highest BPE id (argmax pooling quirk)
    return out


def test_trimmed_pooled_matches_full():
    cfg_full = qa_tiger_config(num_labels=4, **TINY)
    cfg_trim = qa_tiger_config(num_labels=4, text_ctx=32, **TINY)
    params = qa_tiger_init(jax.random.PRNGKey(0), cfg_full)
    quest = jnp.asarray(_tokens(np.random.default_rng(0), 6, eot_max=30))

    pooled_full, words_full = encode_question(params, quest, cfg_full)
    pooled_trim, words_trim = encode_question(params, quest, cfg_trim)
    np.testing.assert_allclose(np.asarray(pooled_full),
                               np.asarray(pooled_trim),
                               rtol=2e-4, atol=1e-5)
    # kept word positions match too (causality)
    np.testing.assert_allclose(np.asarray(words_full)[:, :32],
                               np.asarray(words_trim),
                               rtol=2e-4, atol=1e-5)
    assert words_trim.shape[1] == 32


def test_full_forward_runs_trimmed():
    cfg = qa_tiger_config(num_labels=4, text_ctx=32, **TINY)
    params = qa_tiger_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, T, P = 4, 6, 4
    batch = {
        "quest": jnp.asarray(_tokens(rng, B, eot_max=30)),
        "audio": jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32),
        "video": jnp.asarray(rng.standard_normal((B, T, 32)), jnp.float32),
        "patch": jnp.asarray(rng.standard_normal((B, T, P, 24)), jnp.float32),
    }
    out = qa_tiger_forward(params, batch, cfg, train=False)["out"]
    assert out.shape == (B, 4) and bool(jnp.all(jnp.isfinite(out)))


def test_runner_rejects_eot_beyond_ctx():
    from qa_tiger_tpu.parallel import make_mesh
    from qa_tiger_tpu.training.loop import AVQARunner
    from qa_tiger_tpu.utils import Box

    cfg = Box(dict(
        type="qa-tiger", debug=False, log_interval=100, epochs=1,
        hyper_params=dict(
            model=dict(),
            optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0,
                       encoder_lr=None),
            sched=dict(name="StepLR", step_size=8, gamma=0.1),
        ),
    ))
    model_cfg = qa_tiger_config(num_labels=4, text_ctx=16, **TINY)
    runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                        FROZEN_PREFIXES,
                        mesh=make_mesh(1, devices=jax.devices("cpu")), seed=0)
    bad = np.zeros((2, 77), np.int64)
    bad[:, :20] = 7
    bad[:, 20] = 49407  # EOT at 20 >= ctx 16
    with pytest.raises(ValueError, match="text_ctx"):
        runner._device_batch({"quest": bad})
    ok = np.zeros((2, 77), np.int64)
    ok[:, :10] = 7
    ok[:, 10] = 49407
    assert "quest" in runner._device_batch({"quest": ok})
