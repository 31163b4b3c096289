"""Vectorized 3D Morton (Z-order) encoding/decoding.

The occupancy-grid bitfield is stored Morton-ordered per cascade for
snapshot / dump-file interop with the reference
(tiny-cuda-nn common_device.h morton3D; used by testbed.cu:234-264 and the
density-grid dump format of nerf_mesh_renderer.cu:239-358).

Works on both numpy arrays and jnp arrays (uses the array's namespace).
"""

from __future__ import annotations

import numpy as np


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton3d(x, y, z):
    """Interleave bits: result bit 3i = x bit i, 3i+1 = y, 3i+2 = z."""
    x = np.asarray(x).astype(np.uint32) if isinstance(x, (np.ndarray, int)) else x
    if isinstance(x, np.ndarray):
        y = np.asarray(y).astype(np.uint32)
        z = np.asarray(z).astype(np.uint32)
        return _expand_bits(x) | (_expand_bits(y) << 1) | (_expand_bits(z) << 2)
    # jax path: caller passes jnp arrays (any int dtype)
    import jax.numpy as jnp
    x = x.astype(jnp.uint32)
    y = jnp.asarray(y).astype(jnp.uint32)
    z = jnp.asarray(z).astype(jnp.uint32)
    return _expand_bits(x) | (_expand_bits(y) << 1) | (_expand_bits(z) << 2)


def _compact_bits(v):
    v = v & 0x9249249
    v = (v ^ (v >> 2)) & 0x30C30C3
    v = (v ^ (v >> 4)) & 0x300F00F
    v = (v ^ (v >> 8)) & 0x30000FF
    v = (v ^ (v >> 16)) & 0x3FF
    return v


def morton3d_invert(v):
    """Extract every 3rd bit starting at bit 0 (tcnn morton3D_invert)."""
    if isinstance(v, np.ndarray) or isinstance(v, (int, np.integer)):
        return _compact_bits(np.asarray(v).astype(np.uint32))
    import jax.numpy as jnp
    return _compact_bits(v.astype(jnp.uint32))


def morton_order_lut(res: int = 128) -> np.ndarray:
    """morton_idx[ x + res*(y + res*z) ] for a res^3 grid (numpy, host)."""
    coords = np.arange(res, dtype=np.uint32)
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    # linear layout index i = x + res*y + res^2*z  -> store morton codes
    m = morton3d(x, y, z)
    out = np.empty(res ** 3, dtype=np.uint32)
    out[(x + res * (y + res * z)).reshape(-1)] = m.reshape(-1)
    return out


def morton_to_linear_lut(res: int = 128) -> np.ndarray:
    """linear_idx[morton] for a res^3 grid (inverse permutation)."""
    lut = morton_order_lut(res)
    inv = np.empty_like(lut)
    inv[lut] = np.arange(res ** 3, dtype=np.uint32)
    return inv
