"""Golden-tensor parity: nn primitives vs torch (the SURVEY.md §7 risk list)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from qa_tiger_tpu import nn as qnn


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


class TestLinear:
    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 7, 16), dtype=np.float32)
        tl = torch.nn.Linear(16, 24)
        params = {
            "weight": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy()),
        }
        ours = qnn.linear(params, jnp.asarray(x))
        theirs = tl(_t(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)

    def test_init_statistics(self):
        # torch default Linear init: uniform(+-1/sqrt(fan_in)) on both tensors
        p = qnn.linear_init(jax.random.PRNGKey(0), 256, 128)
        bound = 1 / np.sqrt(256)
        assert np.abs(np.asarray(p["weight"])).max() <= bound
        assert np.abs(np.asarray(p["bias"])).max() <= bound
        # kaiming normal: std ~= sqrt(2/fan_in), zero bias
        p = qnn.kaiming_linear_init(jax.random.PRNGKey(1), 4096, 64)
        std = np.asarray(p["weight"]).std()
        assert abs(std - np.sqrt(2 / 4096)) < 0.002
        assert np.all(np.asarray(p["bias"]) == 0)


class TestLayerNorm:
    def test_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 5, 32), dtype=np.float32) * 4 + 2
        tln = torch.nn.LayerNorm(32)
        with torch.no_grad():
            tln.weight.copy_(torch.randn(32))
            tln.bias.copy_(torch.randn(32))
        params = {
            "weight": jnp.asarray(tln.weight.detach().numpy()),
            "bias": jnp.asarray(tln.bias.detach().numpy()),
        }
        ours = qnn.layer_norm(params, jnp.asarray(x))
        theirs = tln(_t(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def copy_torch_mha(tm: "torch.nn.MultiheadAttention"):
    return {
        "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj": {
            "weight": jnp.asarray(tm.out_proj.weight.detach().numpy()),
            "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
    }


class TestMHA:
    @pytest.mark.parametrize("nhead,sq,sk", [(8, 60, 60), (8, 1, 60), (4, 77, 77), (8, 2, 14)])
    def test_matches_torch_eval(self, nhead, sq, sk):
        d = 64
        rng = np.random.default_rng(2)
        q = rng.standard_normal((5, sq, d), dtype=np.float32)
        k = rng.standard_normal((5, sk, d), dtype=np.float32)
        tm = torch.nn.MultiheadAttention(d, nhead, dropout=0.1)
        tm.eval()
        params = copy_torch_mha(tm)
        ours_out, ours_w = qnn.mha(
            params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
            num_heads=nhead, dropout_p=0.1, train=False,
        )
        with torch.no_grad():
            # torch expects seq-first
            t_out, t_w = tm(
                _t(q).permute(1, 0, 2), _t(k).permute(1, 0, 2), _t(k).permute(1, 0, 2)
            )
        np.testing.assert_allclose(
            np.asarray(ours_out), t_out.permute(1, 0, 2).numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours_w), t_w.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_causal_mask_matches_torch(self):
        d, nhead, s = 32, 4, 10
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, s, d), dtype=np.float32)
        mask = np.triu(np.full((s, s), -np.inf, dtype=np.float32), k=1)
        tm = torch.nn.MultiheadAttention(d, nhead)
        tm.eval()
        params = copy_torch_mha(tm)
        ours_out, _ = qnn.mha(
            params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            num_heads=nhead, attn_mask=jnp.asarray(mask),
        )
        with torch.no_grad():
            t_out, _ = tm(
                _t(x).permute(1, 0, 2), _t(x).permute(1, 0, 2), _t(x).permute(1, 0, 2),
                attn_mask=torch.from_numpy(mask),
            )
        np.testing.assert_allclose(
            np.asarray(ours_out), t_out.permute(1, 0, 2).numpy(), rtol=1e-4, atol=1e-5
        )


class TestDropout:
    def test_eval_identity_and_train_scaling(self):
        x = jnp.ones((1000,))
        assert np.all(np.asarray(qnn.dropout(None, x, 0.5, False)) == 1.0)
        y = qnn.dropout(jax.random.PRNGKey(0), x, 0.5, True)
        y = np.asarray(y)
        assert set(np.unique(y)).issubset({0.0, 2.0})
        assert abs(y.mean() - 1.0) < 0.1


class TestConverter:
    def test_roundtrip_and_module_prefix(self):
        from qa_tiger_tpu.convert import state_dict_to_pytree, nested_to_flat

        sd = {
            "module.a.b.weight": torch.randn(3, 4),
            "module.a.b.bias": torch.randn(3),
            "module.head.weight": torch.randn(2, 3).half(),
        }
        tree = state_dict_to_pytree(sd)
        assert tree["a"]["b"]["weight"].shape == (3, 4)
        assert tree["head"]["weight"].dtype == np.float32
        flat = nested_to_flat(tree)
        assert set(flat) == {"a.b.weight", "a.b.bias", "head.weight"}
