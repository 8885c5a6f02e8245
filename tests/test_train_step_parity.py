"""One full optimization step parity vs torch: identical weights + batch ->
identical CE loss, gradients, and Adam-updated weights (eval-mode forward so
dropout doesn't inject RNG differences)."""
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

from qa_tiger_tpu.convert import nested_to_flat, state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.models import modules as M  # noqa: E402
from qa_tiger_tpu.training import make_optimizer, masked_cross_entropy  # noqa: E402

D, E, K, B, T = 32, 4, 2, 6, 10
LR = 1e-3
BETAS = (0.95, 0.999)


def test_adam_step_matches_torch():
    ref = ref_modules.TempMoE(D, 8, topK=K, n_experts=E).eval()
    head = torch.nn.Linear(D, 5)
    params = jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_pytree(ref.state_dict()))
    # explicit copies: jnp.asarray can zero-copy the torch-backed numpy view
    # on CPU, and torch's opt.step() below mutates those tensors in place
    head_params = {
        "weight": jnp.array(np.array(head.weight.detach().numpy(), copy=True)),
        "bias": jnp.array(np.array(head.bias.detach().numpy(), copy=True)),
    }
    rng = np.random.default_rng(0)
    qst = rng.standard_normal((B, D)).astype(np.float32)
    data = rng.standard_normal((B, T, D)).astype(np.float32)
    labels = rng.integers(0, 5, B).astype(np.int64)

    # ---- torch step
    opt = torch.optim.Adam(list(ref.parameters()) + list(head.parameters()),
                           lr=LR, betas=BETAS, weight_decay=0.0)
    out = ref(torch.tensor(qst), torch.tensor(data))[:, 0]
    logits_t = head(out)
    loss_t = torch.nn.CrossEntropyLoss()(logits_t, torch.tensor(labels))
    opt.zero_grad()
    loss_t.backward()
    # grads BEFORE the step: elements with (near-)zero gradient are excluded
    # from the weight comparison — Adam's first step normalizes g/|g|, so
    # structurally-zero grads (e.g. key biases, softmax shift-invariance)
    # amplify fp noise into +-lr sign flips on both frameworks
    torch_grads = {n: p.grad.detach().clone()
                   for n, p in list(ref.named_parameters())
                   + [("head." + n, p) for n, p in head.named_parameters()]}
    opt.step()

    # ---- jax step (same math: eval-mode forward, masked CE, unit-lr Adam
    # direction scaled by lr, exactly what AVQARunner._train_step_impl does)
    def loss_fn(tp):
        feat = M.temp_moe(tp["moe"], jnp.asarray(qst), jnp.asarray(data),
                          nhead=8, topK=K, n_experts=E, train=False)[:, 0]
        logits = feat @ tp["head"]["weight"].T + tp["head"]["bias"]
        return masked_cross_entropy(logits, jnp.asarray(labels.astype(np.int32)),
                                    jnp.ones(B, bool)), logits

    tree = {"moe": params, "head": head_params}
    tx = make_optimizer(betas=BETAS, weight_decay=0.0)
    opt_state = tx.init(tree)
    (loss_j, logits_j), grads = jax.value_and_grad(loss_fn, has_aux=True)(tree)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    updates, opt_state = tx.update(grads, opt_state, tree)
    updates = jax.tree_util.tree_map(lambda u: LR * u, updates)
    new_tree = jax.tree_util.tree_map(jnp.add, tree, updates)

    # compare every updated parameter against torch's post-step weights
    torch_after = {**{k: v for k, v in ref.state_dict().items()},
                   "head.weight": head.weight.detach(),
                   "head.bias": head.bias.detach()}
    ours_flat = {**nested_to_flat(jax.tree_util.tree_map(np.asarray,
                                                         new_tree["moe"])),
                 **{f"head.{k}": np.asarray(v)
                    for k, v in new_tree["head"].items()}}
    compared = 0
    for name, t_val in torch_after.items():
        ours = ours_flat[name]
        mask = np.abs(torch_grads[name].numpy()) > 1e-6
        if not mask.any():
            continue
        np.testing.assert_allclose(ours[mask], t_val.numpy()[mask],
                                   rtol=2e-3, atol=2e-6, err_msg=name)
        compared += 1
    assert compared > 10
