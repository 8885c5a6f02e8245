"""Cross-framework checkpoint interop: params trained here -> .pt -> loaded
into the torch reference module and verified numerically."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

add_reference_to_path()

from src.models import modules as ref_modules  # noqa: E402

from qa_tiger_tpu.convert.torch_import import (  # noqa: E402
    load_torch_checkpoint,
    save_torch_checkpoint,
)
from qa_tiger_tpu.models import modules as M  # noqa: E402
from qa_tiger_tpu.utils.profiling import AverageMeter  # noqa: E402


def test_jax_params_load_into_torch_reference(tmp_path):
    """Round trip: our TempMoE params -> .pt -> reference TempMoE -> same output."""
    D, E, K = 64, 5, 3
    params = M.temp_moe_init(jax.random.PRNGKey(0), D, E)
    pt = tmp_path / "tempmoe.pt"
    save_torch_checkpoint(
        jax.tree_util.tree_map(np.asarray, params), str(pt))

    ref = ref_modules.TempMoE(D, 8, topK=K, n_experts=E).eval()
    missing, unexpected = ref.load_state_dict(
        torch.load(pt, weights_only=True), strict=True).missing_keys, []
    assert not missing and not unexpected

    rng = np.random.default_rng(0)
    qst = rng.standard_normal((3, D)).astype(np.float32)
    data = rng.standard_normal((3, 20, D)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.tensor(qst), torch.tensor(data))
    j_out = M.temp_moe(params, jnp.asarray(qst), jnp.asarray(data),
                       nhead=8, topK=K, n_experts=E)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=3e-5)


def test_pt_roundtrip_via_loader(tmp_path):
    D, E = 32, 4
    params = M.temp_moe_init(jax.random.PRNGKey(1), D, E)
    pt = tmp_path / "p.pt"
    save_torch_checkpoint(jax.tree_util.tree_map(np.asarray, params), str(pt))
    back = load_torch_checkpoint(str(pt))
    np.testing.assert_array_equal(
        np.asarray(params["router"]["0"]["weight"]),
        back["router"]["0"]["weight"])


def test_average_meter():
    m = AverageMeter()
    m.update([("loss", 2.0), ("aux", 4.0)], step_n=1)
    m.update([("loss", 4.0), ("aux", 0.0)], step_n=1)
    assert m.get("loss") == 3.0
    assert m.get("aux") == 2.0
    m.reset()
    assert m.get("loss") == 0.0
