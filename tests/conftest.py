"""Test configuration: fast startup + an 8-virtual-device CPU backend.

Multi-device sharding is tested on a virtual CPU mesh (the JAX-native way to
validate pjit/shard_map programs without N chips); numeric parity tests vs the
torch reference also run CPU-side.

Platform handling: this image registers a TPU PJRT plugin at interpreter
start; forcing ``JAX_PLATFORMS=cpu`` outright makes that registration block
for minutes waiting on an unclaimed device grant. Keeping the TPU platform
listed *first* and adding ``cpu`` is fast, so we do that and instead pin the
default device to CPU. These env vars must be set before jax initialises its
backends, hence module-level in conftest.
"""
import os
import sys
from pathlib import Path

platforms = os.environ.get("JAX_PLATFORMS", "")
if platforms and "cpu" not in platforms.split(","):
    os.environ["JAX_PLATFORMS"] = platforms + ",cpu"
elif not platforms:
    os.environ["JAX_PLATFORMS"] = "cpu"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup, before any test imports)

# Parity tests compare fp32 against torch-CPU; keep matmuls full precision
# even if something lands on the TPU backend.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "src" / "models" / "modules.py").exists()


def _stub_module(name: str, **attrs):
    import types

    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod


def stub_missing_reference_deps() -> None:
    """Install minimal fakes for optional deps the reference imports but this
    image lacks (torchvision, ftfy, timm, resampy). Only attribute *presence*
    matters — parity tests never execute these code paths."""
    _identity = lambda *a, **k: (a[0] if a else None)  # noqa: E731

    class _Any:  # placeholder class accepting any constructor args
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__path__ = []  # mark as package so submodule imports resolve to stubs
        sys.modules["torchvision"] = tv
    _stub_module(
        "torchvision.transforms",
        Compose=_Any, Resize=_Any, CenterCrop=_Any, ToTensor=_Any,
        Normalize=_Any, InterpolationMode=type("IM", (), {"BICUBIC": 3}),
    )
    _stub_module("torchvision.models")
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    _stub_module("ftfy", fix_text=_identity)
    if "timm" not in sys.modules:
        timm_mod = types.ModuleType("timm")
        timm_mod.__path__ = []  # package, so timm.models.* resolves to stubs
        timm_mod.create_model = _identity
        sys.modules["timm"] = timm_mod
    _stub_module("timm.data",
                 IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
                 IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225))
    _stub_module("timm.models")
    # distinct placeholder classes: the reference's tome patches subclass
    # and isinstance-check these (src/tome/patch/{timm,mae}.py)
    import torch as _torch

    _stub_module("timm.models.vision_transformer",
                 Attention=type("Attention", (_torch.nn.Module,), {}),
                 Block=type("Block", (_torch.nn.Module,), {}),
                 VisionTransformer=type("VisionTransformer",
                                        (_torch.nn.Module,), {}))
    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].vision_transformer = \
        sys.modules["timm.models.vision_transformer"]
    _stub_module("resampy", resample=_identity)
    _stub_module("soundfile", read=_identity, write=_identity)
    # the reference's config plumbing uses python-box; our Box is compatible
    from qa_tiger_tpu.utils import Box as _Box

    _stub_module("box", Box=_Box)


def load_reference_module(relpath: str, name: str):
    """Import one reference .py file standalone (bypassing package __init__
    chains that pull in unavailable deps like real timm)."""
    import importlib.util

    stub_missing_reference_deps()
    spec = importlib.util.spec_from_file_location(
        name, REFERENCE_ROOT / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def add_reference_to_path() -> None:
    """Make the PyTorch reference importable as a golden-parity oracle.

    The reference is PUBLIC UNTRUSTED CONTENT mounted read-only; tests import
    its modules purely to compare numerical outputs of forward passes.
    """
    stub_missing_reference_deps()
    ref = str(REFERENCE_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
