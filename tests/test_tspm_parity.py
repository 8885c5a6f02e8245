"""Golden-tensor parity: TSPM baseline vs the torch reference (eval mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models import tspm as ref_tspm  # noqa: E402 (oracle)

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models import tspm as M  # noqa: E402

RNG = np.random.default_rng(3)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


def to_pytree(module):
    return jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_pytree(module.state_dict()))


def test_av_han_layer_parity():
    ref = ref_tspm.AVHanLayer(64, 1, dim_feedforward=64).eval()
    p = to_pytree(ref)
    a, v = rand(3, 10, 64), rand(3, 10, 64)
    with torch.no_grad():
        t = ref(torch.tensor(a), torch.tensor(v))
    j = M.av_han_layer(p, jnp.asarray(a), jnp.asarray(v), nhead=1, dp=0.1,
                       train=False, rng=None)
    np.testing.assert_allclose(np.asarray(j), t.numpy(), rtol=1e-4, atol=2e-5)


def test_temporal_perception_parity():
    ref = ref_tspm.TemporalPerception(topK=4).eval()
    p = to_pytree(ref)
    a, v, q = rand(3, 20, 512), rand(3, 20, 512), rand(3, 512)
    with torch.no_grad():
        t_a, t_v, t_idx = ref(torch.tensor(a), torch.tensor(v), torch.tensor(q))
    j_a, j_v, j_idx = M.temporal_perception(
        p, jnp.asarray(a), jnp.asarray(v), jnp.asarray(q), topK=4, dp=0.1,
        train=False, rng=None)
    np.testing.assert_array_equal(np.asarray(j_idx), t_idx[:, 0, :])
    np.testing.assert_allclose(np.asarray(j_a), t_a.numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), rtol=1e-4, atol=2e-5)


def test_full_tspm_parity():
    B, T, N = 4, 20, 6
    ref = ref_tspm.TSPM(topK=5, audio_dim=32, vis_dim=48, patch_dim=40,
                        qst_dim=24, hidden_size=512).eval()
    p = to_pytree(ref)
    cfg = M.tspm_config(topK=5, audio_dim=32, vis_dim=48, patch_dim=40,
                        qst_dim=24, hidden_size=512, num_labels=42)
    batch_np = {
        "audio": rand(B, T, 32),
        "video": rand(B, T, 48),
        "patch": rand(B, T, N, 40),
        "quest": rand(B, 1, 24),
        "prompt": rand(B, 1, 24),
    }
    with torch.no_grad():
        t_out = ref({k: torch.tensor(v) for k, v in batch_np.items()})["out"]
    fwd = jax.jit(lambda pp, b: M.tspm_forward(pp, b, cfg, train=False))
    j_out = fwd(p, {k: jnp.asarray(v) for k, v in batch_np.items()})["out"]
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=2e-4, atol=5e-5)
