"""Baked-density fast rendering (MERF/SNeRG-style, opt-in).

The march's dominant cost is hash-table gathers: every sample pays
`levels x 8` lookups for sigma+color. Baking evaluates the network's
density field once onto a dense 3D grid (the fine-grained sibling of the
128^3 occupancy grid); at render time

  - sigma comes from an 8-gather trilinear lookup into the baked grid
    (vs 64+ hash gathers + the density MLP), and
  - the full network runs only for *significant* samples (prospective
    compositing weight above a threshold), compacted across the chunk
    with the same cumsum-partition machinery as ray compaction.

This changes rendering output only by (a) the grid's resolution limit on
the density field and (b) dropped sub-threshold color contributions
(bounded by sig_threshold per sample). It is an explicit opt-in
(`Testbed.bake()`), not the default path — the reference renderer has no
baking (the VDB-acceleration literature, PAPERS.md, motivates it for
TPU where random gathers are the wall).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops.network import (apply_density_activation,
                                          density_raw)


def bake_density_grid(params, config: NGPConfig, resolution: int = 256,
                      batch: int = 1 << 18) -> jnp.ndarray:
    """Evaluate activated density at cell centers of a resolution^3 grid
    over the unit cube -> (R, R, R) float32 [z, y, x]."""
    R = resolution
    g = (np.arange(R, dtype=np.float32) + 0.5) / R
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([xx, yy, zz], -1).reshape(-1, 3)

    fn = jax.jit(lambda p, x: apply_density_activation(
        density_raw(p, x, config)[:, 0], config.density_activation))
    out = []
    for s in range(0, pos.shape[0], batch):
        out.append(fn(params, jnp.asarray(pos[s:s + batch])))
    return jnp.concatenate(out).reshape(R, R, R)


def sample_baked_sigma(sigma_grid: jnp.ndarray, pos01: jnp.ndarray
                       ) -> jnp.ndarray:
    """Trilinear lookup: pos01 (..., 3) in [0,1] -> sigma (...)."""
    R = sigma_grid.shape[0]
    p = jnp.clip(pos01, 0.0, 1.0) * R - 0.5
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, R - 2)
    f = jnp.clip(p - i0, 0.0, 1.0)
    flat = sigma_grid.reshape(-1)

    def at(dx, dy, dz):
        idx = ((i0[..., 2] + dz) * R + (i0[..., 1] + dy)) * R + (i0[..., 0] + dx)
        return jnp.take(flat, idx)

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c00 = at(0, 0, 0) * (1 - fx) + at(1, 0, 0) * fx
    c10 = at(0, 1, 0) * (1 - fx) + at(1, 1, 0) * fx
    c01 = at(0, 0, 1) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(0, 1, 1) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz
