"""Full train-state checkpointing: save/restore round trip resumes training
with identical optimizer state."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models.qa_tiger import (
    FROZEN_PREFIXES,
    qa_tiger_config,
    qa_tiger_forward,
    qa_tiger_init,
)
from qa_tiger_tpu.parallel import make_mesh
from qa_tiger_tpu.training import load_train_state, save_train_state
from qa_tiger_tpu.training.loop import AVQARunner
from qa_tiger_tpu.utils import Box

import qa_tiger_tpu.models.clip_text as ct

ct.CLIP_TEXT_CONFIGS.setdefault(
    "tiny-test", dict(width=32, heads=4, layers=2, embed_dim=32))

TINY = dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
            topK=2, num_experts=4, encoder_type="tiny-test")


def make_runner(seed=0):
    cfg = Box(dict(
        type="qa-tiger", debug=False, log_interval=100, epochs=2,
        hyper_params=dict(
            model=dict(**TINY),
            optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0),
            sched=dict(name="StepLR", step_size=8, gamma=0.1),
        ),
    ))
    model_cfg = qa_tiger_config(num_labels=42, **TINY)
    return AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                      FROZEN_PREFIXES,
                      mesh=make_mesh(1, devices=jax.devices("cpu")),
                      seed=seed)


def synth_batch(rng, b=4):
    return {
        "quest": jnp.asarray(rng.integers(1, 90, (b, 16)).astype(np.int64)),
        "audio": jnp.asarray(rng.standard_normal((b, 8, 16), dtype=np.float32)),
        "video": jnp.asarray(rng.standard_normal((b, 8, 32), dtype=np.float32)),
        "patch": jnp.asarray(rng.standard_normal((b, 8, 3, 24), dtype=np.float32)),
        "label": jnp.asarray(rng.integers(0, 42, b).astype(np.int32)),
        "qtype_label": jnp.asarray(rng.integers(0, 9, b).astype(np.int32)),
        "valid": jnp.ones(b, bool),
    }


def test_resume_bitwise_continuation(tmp_path):
    rng = np.random.default_rng(0)
    batch = synth_batch(rng)
    lr = jnp.float32(1e-3)

    r1 = make_runner()
    for i in range(3):
        r1.trainable, r1.opt_state, _ = r1._train_step(
            r1.trainable, r1.frozen, r1.opt_state, dict(batch), lr,
            jax.random.PRNGKey(i))
    save_train_state(r1.train_state(epoch=1, best_acc=12.5, best_epoch=1),
                     tmp_path / "state")

    # continue training the original runner for 2 more steps
    for i in range(3, 5):
        r1.trainable, r1.opt_state, _ = r1._train_step(
            r1.trainable, r1.frozen, r1.opt_state, dict(batch), lr,
            jax.random.PRNGKey(i))

    # fresh runner (same config seed, so the frozen tower matches — as in a
    # real resume); scramble its trainable params to prove restore overwrites
    r2 = make_runner(seed=0)
    r2.trainable = jax.tree_util.tree_map(lambda a: a + 1.0, r2.trainable)
    template = r2.train_state(epoch=0, best_acc=0.0, best_epoch=-1)
    state = load_train_state(tmp_path / "state", template)
    scalars = r2.restore_train_state(state)
    assert scalars["epoch"] == 1 and scalars["best_acc"] == 12.5
    for i in range(3, 5):
        r2.trainable, r2.opt_state, _ = r2._train_step(
            r2.trainable, r2.frozen, r2.opt_state, dict(batch), lr,
            jax.random.PRNGKey(i))

    for a, b in zip(jax.tree_util.tree_leaves(r1.trainable),
                    jax.tree_util.tree_leaves(r2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_async_orbax_save_roundtrip(tmp_path):
    """save_train_state_async (orbax background thread) -> wait ->
    load_train_state auto-detects the orbax layout and restores exactly."""
    pytest.importorskip("orbax.checkpoint")
    from qa_tiger_tpu.training import (
        save_train_state_async,
        wait_for_async_saves,
    )

    r1 = make_runner()
    batch = synth_batch(np.random.default_rng(1))
    r1.trainable, r1.opt_state, _ = r1._train_step(
        r1.trainable, r1.frozen, r1.opt_state, dict(batch),
        jnp.float32(1e-3), jax.random.PRNGKey(0))
    save_train_state_async(
        r1.train_state(epoch=3, best_acc=55.5, best_epoch=2),
        tmp_path / "astate")
    wait_for_async_saves()

    r2 = make_runner(seed=0)
    template = r2.train_state(epoch=0, best_acc=0.0, best_epoch=-1)
    state = load_train_state(tmp_path / "astate", template)
    scalars = r2.restore_train_state(state)
    assert scalars["epoch"] == 3 and scalars["best_acc"] == 55.5
    for a, b in zip(jax.tree_util.tree_leaves(r1.trainable),
                    jax.tree_util.tree_leaves(r2.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_rng_resumes_the_same_stream(tmp_path):
    """The per-step dropout RNG rides in the checkpoint meta, so a resumed
    run draws the SAME dropout keys an uninterrupted run would have —
    without this, resume equality is only statistical."""
    r1 = make_runner()
    for _ in range(4):  # advance the stateful stream as train_epoch does
        r1._step_rng, _ = jax.random.split(r1._step_rng)
    save_train_state(r1.train_state(epoch=2, best_acc=1.0, best_epoch=2),
                     tmp_path / "state")

    r2 = make_runner(seed=0)
    template = r2.train_state(epoch=0, best_acc=0.0, best_epoch=-1)
    scalars = r2.restore_train_state(
        load_train_state(tmp_path / "state", template))
    assert "step_rng" not in scalars  # consumed, not leaked to the caller
    np.testing.assert_array_equal(np.asarray(r1._step_rng),
                                  np.asarray(r2._step_rng))
    np.testing.assert_array_equal(
        np.asarray(jax.random.split(r1._step_rng)[1]),
        np.asarray(jax.random.split(r2._step_rng)[1]))
