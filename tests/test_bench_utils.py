"""Benchmark harness + ToMe visualization utilities."""
import numpy as np

import jax.numpy as jnp

from qa_tiger_tpu.pipeline.vis import generate_colormap, make_visualization
from qa_tiger_tpu.utils.benchmark import benchmark


def test_benchmark_returns_throughput():
    def fn(x):
        return x * 2.0

    ips = benchmark(fn, jnp.ones((16, 8)), runs=8, throw_out=0.25,
                    items_per_call=16)
    assert ips > 0


def test_benchmark_bf16_cast():
    seen = {}

    def fn(x):
        seen["dtype"] = x.dtype
        return x + 1

    benchmark(fn, jnp.ones((4, 4), jnp.float32), runs=4, use_bf16=True)
    assert seen["dtype"] == jnp.bfloat16


def test_visualization_shapes_and_groups():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    # 4 groups over a 4x4 grid of 8px patches (16 patches + cls column)
    source = np.zeros((4, 17), np.float32)
    for patch in range(16):
        source[patch % 4, patch + 1] = 1.0
    out = make_visualization(img, source, patch_size=8, class_token=True)
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # different groups produce different tints somewhere
    assert len(np.unique(out.reshape(-1, 3), axis=0)) > 4


def test_colormap_deterministic():
    np.testing.assert_array_equal(generate_colormap(5, seed=1),
                                  generate_colormap(5, seed=1))
    assert generate_colormap(5, 1).shape == (5, 3)


def test_compilation_cache_opt_in(tmp_path, monkeypatch):
    """enable_compilation_cache is a no-op unless explicitly requested (the
    warm-cache path measured SLOWER than recompiling on the axon backend -
    see utils/cache.py docstring)."""
    from qa_tiger_tpu.utils import enable_compilation_cache

    monkeypatch.delenv("QA_TIGER_CACHE_DIR", raising=False)
    monkeypatch.delenv("JAX_CACHE_DIR", raising=False)
    assert enable_compilation_cache() is None
    monkeypatch.setenv("QA_TIGER_CACHE_DIR", "off")
    assert enable_compilation_cache() is None
    d = tmp_path / "jaxcache"
    assert enable_compilation_cache(str(d)) == str(d)
    assert d.is_dir()


def test_bench_model_flag_parsing():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import parse_model

    assert parse_model([]) == "qa-tiger"
    assert parse_model(["--model", "tspm"]) == "tspm"
    assert parse_model(["--model=tspm"]) == "tspm"
    assert parse_model(["--other", "tspm"]) == "qa-tiger"
