"""ToMe merge-visualization parity (qa_tiger_tpu.pipeline.vis vs the
reference's src/tome/vis.py:32-88).

The reference renders with PIL + scipy erosion; the deterministic core —
which source patch lands in which merged group, and the per-group pixel
masks after nearest-neighbour upsampling — is identical math and is what
gets compared here (mask arrays, not pixels; the tint/border styling is
rendering, not parity surface).
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import load_reference_module

from qa_tiger_tpu.pipeline.vis import (
    generate_colormap,
    group_assignment,
    make_visualization,
)

GRID, PATCH = 8, 16
TOKENS = 1 + GRID * GRID  # class token + patch grid
GROUPS = 12


def _source(seed=0):
    """A realistic provenance matrix: every patch token traces to exactly
    one merged group (rows of merge_source are {0,1} indicators), plus a
    class-token column."""
    rng = np.random.default_rng(seed)
    src = np.zeros((GROUPS, TOKENS), np.float32)
    owner = rng.integers(0, GROUPS, TOKENS)
    owner[: GROUPS] = np.arange(GROUPS)  # every group owns >= 1 token
    src[owner, np.arange(TOKENS)] = 1.0
    return src


def test_group_assignment_matches_reference_argmax():
    # reference src/tome/vis.py:55-58: drop the class column, argmax over
    # the group dim
    import torch

    src = _source()
    want = torch.as_tensor(src)[None][:, :, 1:].argmax(dim=1)[0]
    got = group_assignment(src, class_token=True)
    np.testing.assert_array_equal(got.reshape(-1), want.numpy())

    # class_token=False keeps every column
    src_nc = src[:, 1:]
    got_nc = group_assignment(src_nc, class_token=False)
    np.testing.assert_array_equal(got_nc, got)


def test_group_masks_match_reference_interpolation():
    # reference src/tome/vis.py:67-70: per-group (vis == i) masks upsampled
    # with F.interpolate(..., mode="nearest"); ours is np.kron with a
    # patch_size block — identical when H, W are exact patch multiples
    import torch
    import torch.nn.functional as F

    src = _source(1)
    h = w = GRID * PATCH
    assignment = group_assignment(src)
    ours = np.kron(assignment, np.ones((PATCH, PATCH), int))

    vis = torch.as_tensor(src)[None][:, :, 1:].argmax(dim=1)
    for i in range(GROUPS):
        mask = (vis == i).float().view(1, 1, GRID, GRID)
        mask = F.interpolate(mask, size=(h, w), mode="nearest")
        np.testing.assert_array_equal(
            (ours == i), mask.view(h, w).numpy().astype(bool),
            err_msg=f"group {i} pixel mask diverges from the reference")


def test_reference_make_visualization_runs_on_same_inputs():
    # the full reference renderer (PIL in, PIL out) accepts the same
    # provenance matrix and emits an image of the input size — proves the
    # oracle itself executes on the shapes our pipeline produces
    torch = pytest.importorskip("torch")
    PIL_Image = pytest.importorskip("PIL.Image")
    pytest.importorskip("scipy.ndimage")
    ref = load_reference_module("src/tome/vis.py", "ref_tome_vis")

    h = w = GRID * PATCH
    rng = np.random.default_rng(2)
    img = PIL_Image.fromarray(
        rng.integers(0, 255, (h, w, 3), np.uint8), "RGB")
    src = torch.as_tensor(_source(2))[None]
    out = ref.make_visualization(img, src, patch_size=PATCH,
                                 class_token=True)
    assert out.size == (w, h)


def test_make_visualization_output_contract():
    src = _source(3)
    h = w = GRID * PATCH
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    out = make_visualization(img, src, patch_size=PATCH)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # deterministic given the seed
    np.testing.assert_array_equal(
        out, make_visualization(img, src, patch_size=PATCH))

    # borders between differing groups are darkened relative to the plain
    # alpha blend; interior pixels are exactly the blend
    assignment = group_assignment(src)
    mask = np.kron(assignment, np.ones((PATCH, PATCH), int))
    border = np.zeros((h, w), bool)
    border[:-1, :] |= mask[:-1, :] != mask[1:, :]
    border[:, :-1] |= mask[:, :-1] != mask[:, 1:]
    blend = 0.5 * img + 0.5 * generate_colormap(GROUPS)[mask]
    np.testing.assert_allclose(out[~border], np.clip(blend, 0, 1)[~border],
                               rtol=1e-6, atol=1e-6)
    assert (out[border] <= blend[border] + 1e-6).all()
    assert border.any() and (out[border] < blend[border] - 1e-3).any()
