"""ToMe bipartite soft matching parity vs the reference torch implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import load_reference_module, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

# oracle modules, loaded standalone (the tome package __init__ requires timm)
ref_merge = load_reference_module("src/tome/merge.py", "ref_tome_merge")
ref_tome_utils = load_reference_module("src/tome/utils.py", "ref_tome_utils")

from qa_tiger_tpu.ops import tome  # noqa: E402

RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape, dtype=np.float32)


class TestParseR:
    def test_matches_reference(self):
        ref_parse_r = ref_tome_utils.parse_r
        for r in [25, [25] * 23, (25, -1.0), (16, 0.5), 0]:
            assert tome.parse_r(24, r) == ref_parse_r(24, r)

    def test_schedule_ends_at_14(self):
        plan = tome.tome_schedule(577, [25] * 23, protected=1)
        assert plan[-1][1] == 14
        assert plan[0] == (25, 552)


@pytest.mark.parametrize("t,r,cls", [(20, 5, False), (21, 6, True),
                                     (577, 25, True), (27, 25, True)])
class TestBipartiteMatching:
    def test_merge_parity(self, t, r, cls):
        metric = rand(2, t, 16)
        x = rand(2, t, 8)
        t_merge, _ = ref_merge.bipartite_soft_matching(
            torch.tensor(metric), r, class_token=cls)
        j_merge, _ = tome.bipartite_soft_matching(jnp.asarray(metric), r,
                                                  class_token=cls)
        for mode in ("sum", "amax", "mean"):
            t_out = t_merge(torch.tensor(x), mode=mode)
            j_out = j_merge(jnp.asarray(x), mode=mode)
            np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"mode={mode}")

    def test_merge_wavg_parity(self, t, r, cls):
        metric = rand(2, t, 16)
        x = rand(2, t, 8)
        size = np.abs(rand(2, t, 1)) + 1
        t_m, _ = ref_merge.bipartite_soft_matching(
            torch.tensor(metric), r, class_token=cls)
        j_m, _ = tome.bipartite_soft_matching(jnp.asarray(metric), r,
                                              class_token=cls)
        t_x, t_s = ref_merge.merge_wavg(t_m, torch.tensor(x), torch.tensor(size))
        j_x, j_s = tome.merge_wavg(j_m, jnp.asarray(x), jnp.asarray(size))
        np.testing.assert_allclose(np.asarray(j_x), t_x.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_s), t_s.numpy(), rtol=1e-4, atol=1e-5)

    def test_unmerge_parity(self, t, r, cls):
        metric = rand(2, t, 16)
        t_m, t_u = ref_merge.bipartite_soft_matching(
            torch.tensor(metric), r, class_token=cls)
        j_m, j_u = tome.bipartite_soft_matching(jnp.asarray(metric), r,
                                                class_token=cls)
        x = rand(2, t, 8)
        t_merged = t_merge_out = t_m(torch.tensor(x), mode="sum")
        j_merged = j_m(jnp.asarray(x), mode="sum")
        t_back = t_u(t_merged)
        j_back = j_u(j_merged)
        np.testing.assert_allclose(np.asarray(j_back), t_back.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_merge_source_parity(self, t, r, cls):
        metric = rand(2, t, 16)
        x = rand(2, t, 8)
        t_m, _ = ref_merge.bipartite_soft_matching(
            torch.tensor(metric), r, class_token=cls)
        j_m, _ = tome.bipartite_soft_matching(jnp.asarray(metric), r,
                                              class_token=cls)
        t_src = ref_merge.merge_source(t_m, torch.tensor(x))
        j_src = tome.merge_source(j_m, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(j_src), t_src.numpy())


class TestKthMatching:
    @pytest.mark.parametrize("t,k", [(20, 2), (21, 3), (16, 4)])
    def test_merge_parity(self, t, k):
        metric = rand(2, t, 16)
        x = rand(2, t, 8)
        t_m, t_u = ref_merge.kth_bipartite_soft_matching(torch.tensor(metric), k)
        j_m, j_u = tome.kth_bipartite_soft_matching(jnp.asarray(metric), k)
        for mode in ("sum", "amax"):
            np.testing.assert_allclose(
                np.asarray(j_m(jnp.asarray(x), mode=mode)),
                t_m(torch.tensor(x), mode=mode).numpy(),
                rtol=1e-4, atol=1e-5)
        merged = t_m(torch.tensor(x), mode="sum")
        np.testing.assert_allclose(
            np.asarray(j_u(jnp.asarray(merged.numpy()))),
            t_u(merged).numpy(), rtol=1e-4, atol=1e-5)

    def test_k1_identity(self):
        m, u = tome.kth_bipartite_soft_matching(jnp.asarray(rand(1, 8, 4)), 1)
        x = jnp.asarray(rand(1, 8, 4))
        assert m(x) is x and u(x) is x


class TestRandomMatching:
    def test_shapes_and_unmerge_consistency(self):
        """Random variant has RNG-dependent sets, so check invariants instead
        of torch parity: output size N-r, unmerge restores dst positions."""
        import jax

        metric = jnp.asarray(rand(2, 12, 16))
        x = jnp.asarray(rand(2, 12, 8))
        merge, unmerge = tome.random_bipartite_soft_matching(
            metric, 4, rng=jax.random.PRNGKey(3))
        merged = merge(x, mode="sum")
        assert merged.shape == (2, 8, 8)
        back = unmerge(merged)
        assert back.shape == (2, 12, 8)
        # every original position receives some value (sources copy their dst)
        assert np.all(np.any(np.asarray(back) != 0, axis=-1))


def test_r_zero_is_identity():
    metric = rand(2, 10, 4)
    merge, unmerge = tome.bipartite_soft_matching(jnp.asarray(metric), 0)
    x = jnp.asarray(rand(2, 10, 4))
    assert merge(x) is x
    assert unmerge(x) is x
