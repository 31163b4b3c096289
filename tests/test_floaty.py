"""Floaty removal: python/scipy oracle vs native C++ implementation."""

import numpy as np
import pytest

from nerf_glasses_tpu.models import floaty


def make_grid(blobs):
    """blobs: list of (center_cell, radius_cells) at mip 0."""
    g = np.zeros((8, 128, 128, 128), np.uint8)
    idx = np.arange(128)
    z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
    for (cx, cy, cz), r in blobs:
        m = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2 < r * r
        g[0][m] = 1
    # propagate to coarser mips like bitfield_max_pool
    for lvl in range(1, 8):
        pooled = g[lvl - 1].reshape(64, 2, 64, 2, 64, 2).max(axis=(1, 3, 5))
        g[lvl][32:96, 32:96, 32:96] |= pooled
    return g


def test_python_cluster_keeps_big_blob():
    g = make_grid([((64, 64, 64), 12), ((20, 20, 20), 4)])
    out, n = floaty._try_native(g) or (None, None)
    # force the python path for the oracle
    labels, (m, x, y, z), n_comp = floaty.cluster(g)
    assert n_comp >= 2
    cleaned, n2 = _python_remove(g)
    assert cleaned[0, 64, 64, 64] == 1
    assert cleaned[0, 20, 20, 20] == 0
    # ancestors set in coarser mips
    assert cleaned[1, 32 + 32, 32 + 32, 32 + 32] == 1


def _python_remove(g):
    labels, (m, x, y, z), n_comp = floaty.cluster(g)
    scores = floaty.cluster_importance(labels, m, n_comp)
    winner = int(np.argmax(scores))
    keep = labels == winner
    out = np.zeros_like(g)
    km, kx, ky, kz = m[keep], x[keep], y[keep], z[keep]
    out[km, kz, ky, kx] = 1
    cm, cx, cy, cz = km.copy(), kx.copy(), ky.copy(), kz.copy()
    while True:
        sel = cm < 7
        if not sel.any():
            break
        cm = cm[sel] + 1
        cx = 32 + cx[sel] // 2
        cy = 32 + cy[sel] // 2
        cz = 32 + cz[sel] // 2
        out[cm, cz, cy, cx] = 1
    return out, int(len(np.unique(labels[labels >= 0])))


def test_native_matches_python():
    try:
        from nerf_glasses_tpu.models import _native_floaty
        _native_floaty._load()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    g = make_grid([((64, 64, 64), 10), ((24, 90, 30), 5), ((100, 20, 100), 3)])
    py_out, py_n = _python_remove(g)
    nat_out, nat_n = _native_floaty.remove_floaties(g)
    assert nat_n == py_n
    np.testing.assert_array_equal(nat_out, py_out)


def test_native_speed_reasonable():
    try:
        from nerf_glasses_tpu.models import _native_floaty
        _native_floaty._load()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    import time
    g = make_grid([((64, 64, 64), 25), ((20, 20, 20), 6)])
    t0 = time.monotonic()
    out, n = _native_floaty.remove_floaties(g)
    dt = time.monotonic() - t0
    assert n >= 2
    assert dt < 2.0  # reference prints ~hundreds of ms for this pass
