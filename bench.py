"""Benchmark: QA-TIGER eval throughput (QA pairs/sec/chip) on the local
accelerator vs the PyTorch-CPU reference baseline.

Measures the full shipped-config inference path — CLIP-L/14 frozen text tower
on tokenized questions + projections + cross-attention + patch selection +
Gaussian-expert aggregation + classifier — on synthetic inputs with the real
shapes (T=60 frames, P=14 ToMe tokens, 77-token questions). Throughput does
not depend on weight values, so random weights give the true hardware number
without the (unavailable-offline) released checkpoint.

Baseline: the same network from the reference implementation on torch-CPU
(the PR1 CPU-runnable config from BASELINE.md), measured live when the
reference tree is importable; otherwise a recorded constant from this machine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import socket
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

BATCH = 256
T, P = 60, 14
WARMUP_ITERS = 3
BENCH_ITERS = 20
EVAL_DTYPE = "bfloat16"  # the BASELINE bf16 jitted-eval configuration
TORCH_BATCH = 32
TORCH_ITERS = 6
REPEATS = 3  # timed repetitions; report the median for tunnel-noise immunity
# torch-CPU qa-pairs/sec on this image's single-core host, measured via the
# live path below (3-4 qa/s across runs); used only if the reference tree is
# unavailable.
FALLBACK_TORCH_QPS = 3.5


def _batch(rng, b):
    return {
        "quest": rng.integers(1, 49406, (b, 77)).astype(np.int64),
        "audio": rng.standard_normal((b, T, 128)).astype(np.float32),
        "video": rng.standard_normal((b, T, 768)).astype(np.float32),
        "patch": rng.standard_normal((b, T, P, 1024)).astype(np.float32),
    }


def _tspm_batch(rng, b):
    # TSPM consumes precomputed CLIP question + QA-prompt features
    # (reference src/models/tspm.py:347-400)
    batch = _batch(rng, b)
    batch["quest"] = rng.standard_normal((b, 768)).astype(np.float32)
    batch["prompt"] = rng.standard_normal((b, 768)).astype(np.float32)
    return batch


def bench_tspm() -> float:
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.models.tspm import tspm_config, tspm_forward, tspm_init

    cfg = tspm_config(topK=10, num_labels=42)
    params = tspm_init(jax.random.PRNGKey(0), cfg)
    dtype = jnp.dtype(EVAL_DTYPE)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    batch = {
        k: (jnp.asarray(v).astype(dtype)
            if np.issubdtype(v.dtype, np.floating) else jnp.asarray(v))
        for k, v in _tspm_batch(np.random.default_rng(0), BATCH).items()
    }
    fwd = jax.jit(lambda p, b: tspm_forward(p, b, cfg, train=False)["out"])
    np.asarray(fwd(params, batch))
    for _ in range(WARMUP_ITERS):
        np.asarray(fwd(params, batch))
    rates = []
    for _ in range(REPEATS):
        start = time.perf_counter()
        for _ in range(BENCH_ITERS):
            out = fwd(params, batch)
        np.asarray(out)
        rates.append(BATCH * BENCH_ITERS / (time.perf_counter() - start))
    return float(np.median(rates))


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from qa_tiger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from qa_tiger_tpu.models.qa_tiger import (
        qa_tiger_config,
        qa_tiger_forward,
        qa_tiger_init,
    )

    cfg = qa_tiger_config(
        d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
        topK=7, num_experts=7, num_labels=42, encoder_type="ViT-L/14@336px")
    params = qa_tiger_init(jax.random.PRNGKey(0), cfg)
    dtype = jnp.dtype(EVAL_DTYPE)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    batch = {
        k: (jnp.asarray(v).astype(dtype)
            if np.issubdtype(v.dtype, np.floating) else jnp.asarray(v))
        for k, v in _batch(np.random.default_rng(0), BATCH).items()
    }

    fwd = jax.jit(lambda p, b: qa_tiger_forward(p, b, cfg, train=False)["out"])
    # np.asarray forces full host materialization — on remote/experimental
    # backends block_until_ready can return before execution finishes, which
    # would inflate the number by orders of magnitude.
    np.asarray(fwd(params, batch))
    for _ in range(WARMUP_ITERS):
        np.asarray(fwd(params, batch))
    rates = []
    for _ in range(REPEATS):
        start = time.perf_counter()
        for _ in range(BENCH_ITERS):
            out = fwd(params, batch)
        np.asarray(out)
        rates.append(BATCH * BENCH_ITERS / (time.perf_counter() - start))
    return float(np.median(rates)), flops_per_batch(fwd, params, batch)


def flops_per_batch(fwd, params, batch) -> float | None:
    """Compiled-graph FLOPs for one forward batch, from XLA's own cost
    analysis (Pallas custom calls contribute the flops declared in their
    pl.CostEstimate). Falls back to the analytic text-tower count — the
    derivation and a cross-check against this number live in
    docs/PROFILE.md ("Roofline") — when the backend has no cost model."""
    try:
        flops = fwd.lower(params, batch).compile().cost_analysis()
        if isinstance(flops, list):  # older jax returns [dict]
            flops = flops[0]
        flops = float(flops["flops"])
        if flops > 0:
            return flops
    except Exception:
        pass
    # analytic floor: CLIP-L text tower (W=768, S=77, 12 layers) per sample
    # = 12 * (24*S*W^2 + 4*S^2*W) ~= 1.33e10/sample (3.4e12/batch at
    # B=256); the fusion model adds ~6% (docs/PROFILE.md)
    w, s, layers = 768, 77, 12
    return BATCH * layers * (24 * s * w * w + 4 * s * s * w) * 1.06


# bf16 peak of one TPU v5e (v5litepod) chip; the MFU denominator. Other
# device kinds fall back to None rather than a wrong roofline.
PEAK_BF16_FLOPS = {"v5e": 197e12, "v5litepod": 197e12, "v5lite": 197e12,
                   "v6e": 918e12, "v4": 275e12, "v5p": 459e12}


def peak_flops() -> float | None:
    import jax

    dev = jax.devices()[0]
    kind = dev.device_kind.lower().replace(" ", "")
    for key, peak in PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    # the axon PJRT plugin fronts a v5e chip (BASELINE.md hardware notes)
    return PEAK_BF16_FLOPS["v5e"] if dev.platform == "axon" else None


def bench_torch_reference() -> float | None:
    """Reference QA_TIGER on torch CPU with a real-size random text tower."""
    try:
        import torch

        sys.path.insert(0, str(ROOT / "tests"))
        from conftest import add_reference_to_path, reference_available

        if not reference_available():
            return None
        add_reference_to_path()
        from src.models import net as ref_net
        from src.models.base import clip_base as ref_clip

        class Tower(torch.nn.Module):
            def __init__(self, width=768, heads=12, layers=12, embed=768,
                         vocab=49408, ctx=77):
                super().__init__()
                mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
                self.token_embedding = torch.nn.Embedding(vocab, width)
                self.positional_embedding = torch.nn.Parameter(
                    torch.randn(ctx, width) * 0.01)
                self.transformer = ref_clip.Transformer(
                    width, layers, heads, q_aware_N=-1, attn_mask=mask)
                self.ln_final = torch.nn.LayerNorm(width)
                self.text_projection = torch.nn.Parameter(
                    torch.randn(width, embed) * width ** -0.5)

            def forward(self, text):
                x = self.token_embedding(text)
                x = x + self.positional_embedding[: x.shape[1]]
                x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
                x = self.ln_final(x)
                pooled = x[torch.arange(x.shape[0]),
                           torch.argmax(text, dim=-1)] @ self.text_projection
                return pooled, x

            def freeze(self):
                for p in self.parameters():
                    p.requires_grad = False

        orig = ref_net.CLIP_TEncoder
        ref_net.CLIP_TEncoder = lambda _t: Tower()
        try:
            model = ref_net.QA_TIGER(
                d_model=512, video_dim=768, patch_dim=1024, audio_dim=128,
                topK=7, num_experts=7, encoder_type="unused").eval()
        finally:
            ref_net.CLIP_TEncoder = orig

        b = _batch(np.random.default_rng(1), TORCH_BATCH)
        tb = {k: torch.tensor(v) for k, v in b.items()}
        with torch.no_grad():
            model(tb)  # warmup
            times = []
            for _ in range(TORCH_ITERS):
                start = time.perf_counter()
                model(tb)
                times.append(time.perf_counter() - start)
        return TORCH_BATCH / float(np.median(times))
    except Exception as exc:  # pragma: no cover
        print(f"# torch baseline failed: {exc}", file=sys.stderr)
        return None


def tunnel_alive(timeout: float = 5.0) -> bool:
    """Bounded probe of the axon TPU tunnel (a stdio relay on 8082-8117).

    When the relay dies, any jax backend resolution hangs forever inside the
    axon plugin's connect-retry loop — so probe BEFORE importing jax and emit
    a parseable diagnostic instead of timing out (round-3 BENCH failure mode).
    Returns True when no tunnel is expected (pure-CPU env) or the relay
    accepts a connection.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # no axon registration → nothing to hang on
    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return True
    try:
        socket.create_connection(("127.0.0.1", 8113), timeout=timeout).close()
        return True
    except OSError:
        return False


def parse_model(args) -> str:
    """--model NAME or --model=NAME (default qa-tiger)."""
    if "--model" in args:
        return args[args.index("--model") + 1]
    for a in args:
        if a.startswith("--model="):
            return a.split("=", 1)[1]
    return "qa-tiger"


def main():
    model = parse_model(sys.argv[1:])
    if not tunnel_alive():
        # One parseable JSON line instead of an infinite hang / traceback:
        # the TPU tunnel is down, so the axon backend cannot initialize.
        print(json.dumps({
            "metric": "qa_pairs_per_sec_per_chip" if model != "tspm"
            else "tspm_qa_pairs_per_sec_per_chip",
            "value": None, "unit": "qa/s",
            "error": "tpu tunnel down (127.0.0.1:8113 refused); "
                     "axon backend unavailable — bench skipped",
        }))
        return
    if model == "tspm":
        # secondary metric: TSPM baseline throughput (no torch denominator)
        qps = bench_tspm()
        print(json.dumps({
            "metric": "tspm_qa_pairs_per_sec_per_chip",
            "value": round(qps, 2), "unit": "qa/s"}))
        return
    jax_qps, flops = bench_jax()
    # QA_TIGER_SKIP_TORCH=1: skip the 10-15 min torch-CPU denominator for
    # quick A/B iterations (vs_baseline then uses the documented fallback)
    torch_qps = None if os.environ.get("QA_TIGER_SKIP_TORCH") == "1" \
        else bench_torch_reference()
    measured = torch_qps is not None
    if not measured:
        torch_qps = FALLBACK_TORCH_QPS
    peak = peak_flops()
    # roofline: fraction of the chip's bf16 peak the measured rate implies.
    # Unlike vs_baseline (whose torch-CPU denominator swings 1.3-4.8 qa/s
    # run to run), MFU is a stable acceptance gate: flops are read from the
    # compiled graph and peak is a hardware constant.
    mfu = (jax_qps / BATCH * flops / peak) if (flops and peak) else None
    print(json.dumps({
        "metric": "qa_pairs_per_sec_per_chip",
        "value": round(jax_qps, 2),
        "unit": "qa/s",
        "vs_baseline": round(jax_qps / torch_qps, 2),
        # the denominator, for honesty: the live torch-CPU single-core rate
        # is noisy run to run (measured 1.3-4.8 qa/s on this host), so
        # vs_baseline swings with it while `value` stays stable
        "torch_qps": round(torch_qps, 2),
        "torch_qps_measured": measured,
        "flops_per_sample": round(flops / BATCH) if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
    }))


if __name__ == "__main__":
    main()
