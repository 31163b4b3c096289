"""Multiresolution hash-grid encoding (Instant-NGP) — jnp reference path.

Functionally equivalent to tiny-cuda-nn's GridEncoding with
otype=HashGrid, hash=CoherentPrime, interpolation=Linear
(tiny-cuda-nn/include/tiny-cuda-nn/encodings/grid.h:112-198, 260-395):

- per-level scale:    s_l = 2^(l * log2(b)) * N_min - 1, res_l = ceil(s_l)+1
- vertex coords:      p = x * s_l + 0.5 ; corner = floor(p); w = frac(p)
- index:              dense x + res*y + res^2*z if the level fits,
                      else (x*1 ^ y*2654435761 ^ z*805459861), both
                      taken modulo the level's table size
- output:             trilinear interpolation of F=2 features over the 8
                      corners, concatenated level-major (L*F features).

The table is a single (n_rows, F) array in HBM; per-level slices follow the
tcnn offset table (8-aligned, dense-or-2^19 rows). Gathers are expressed as
jnp.take so XLA emits TPU dynamic-gather; a Pallas fast path lives in
ops/hashgrid_pallas.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu import constants as C

# The 8 corner offsets of a cell, bit i of idx selects dim i (grid.h:320-334).
_CORNERS = np.array(
    [[(i >> d) & 1 for d in range(3)] for i in range(8)], dtype=np.int32
)  # (8, 3)


def level_corner_indices(pos: jnp.ndarray, resolution: int, scale: float,
                         hashmap_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For positions (N, 3) in [0,1], return (indices (N, 8), weights (N, 8)).

    Indices are *row* indices into the level's table slice.
    """
    p = pos * jnp.float32(scale) + 0.5
    grid_f = jnp.floor(p)
    frac = p - grid_f
    grid = grid_f.astype(jnp.int32)  # (N, 3)

    corners = grid[:, None, :] + _CORNERS[None]  # (N, 8, 3)

    # trilinear weights: prod over dims of (frac if corner bit else 1-frac)
    w = jnp.where(_CORNERS[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]  # (N, 8)

    dense_size = resolution ** 3
    if dense_size <= hashmap_size:
        idx = (corners[..., 0]
               + corners[..., 1] * resolution
               + corners[..., 2] * resolution * resolution)
        idx = idx.astype(jnp.uint32) % jnp.uint32(hashmap_size)
    else:
        cu = corners.astype(jnp.uint32)
        idx = (cu[..., 0] * jnp.uint32(C.HASH_PRIMES[0])
               ^ cu[..., 1] * jnp.uint32(C.HASH_PRIMES[1])
               ^ cu[..., 2] * jnp.uint32(C.HASH_PRIMES[2]))
        idx = idx % jnp.uint32(hashmap_size)
    return idx.astype(jnp.int32), weights


def hash_encode(table: jnp.ndarray, pos: jnp.ndarray, config: NGPConfig,
                compute_dtype=jnp.float32) -> jnp.ndarray:
    """table: (n_grid_rows, F); pos: (N, 3) in [0,1] -> (N, L*F) features."""
    from nerf_glasses_tpu.config import grid_scale
    feats = []
    for level, (offset, hashmap_size, resolution) in enumerate(config.level_params()):
        scale = grid_scale(level, config.log2_per_level_scale, config.base_resolution)
        idx, w = level_corner_indices(pos, resolution, scale, hashmap_size)
        sub = table[offset:offset + hashmap_size]
        vals = jnp.take(sub, idx, axis=0)  # (N, 8, F)
        f = jnp.sum(vals.astype(compute_dtype) * w[..., None].astype(compute_dtype),
                    axis=1)  # (N, F)
        feats.append(f)
    return jnp.concatenate(feats, axis=-1)


def hash_table_init(key, config: NGPConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init, matching tcnn grid.h initialize_params."""
    return jax.random.uniform(
        key, (config.n_grid_rows, config.n_features_per_level),
        minval=-1e-4, maxval=1e-4, dtype=dtype)
