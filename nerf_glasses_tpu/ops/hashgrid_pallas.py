"""Pallas TPU kernel for the multiresolution hash encoding (fast path).

Why a kernel: XLA's HBM gather moves ~130-200M random rows/s on a v5e,
and a 720p frame needs ~10^9 corner lookups — gathers dominate the whole
renderer (SURVEY.md §7 "hard parts" #1). The TPU's *hardware* gather is a
per-vreg lane permute (Mosaic lowers jnp.take_along_axis on a (8,128)
operand); this kernel keeps the entire table resident in VMEM and routes
every corner lookup through that primitive:

  table:   (L, W, 8, 128) float32-bitcast-u32; each u32 packs the level's
           F=2 bf16 features of one entry; W = S/1024 windows/level
  lookup:  h -> window w = h>>10, sublane r = (h>>7)&7, lane c = h&127
  gather:  for each sublane-row of 128 lookups and each window:
             G  = take_along_axis(T8, broadcast(c), axis=1)   # lane step
             V8 = take_along_axis(G, broadcast(r), axis=0)    # sublane step
           accumulated under a (w == window) mask.

Requirements (NGPConfig.all_hash fast variant): every level is a
power-of-2 hash table of the same size S <= 2^15 so the whole table fits
in VMEM (L * S * 4B; 1 MiB at L=16, S=2^14) and the level loop uses one
constant AND-mask. The jnp path (ops/hashgrid.py) remains the reference
implementation and handles tcnn-exact configs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.config import NGPConfig, grid_scale

# Block of samples per grid step: 8 sublane-rows x 128 lanes.
BLOCK = 1024
ROWS = BLOCK // 128


def supports_config(config: NGPConfig) -> bool:
    if not config.all_hash:
        return False
    if config.n_features_per_level != 2:
        return False
    S = 1 << config.log2_hashmap_size
    if S % BLOCK != 0:
        return False
    # table must fit comfortably in VMEM alongside block scratch
    return config.n_levels * S * 4 <= 8 * 1024 * 1024


def pack_table(grid: np.ndarray, config: NGPConfig) -> jnp.ndarray:
    """(L, S, 2) float32 -> (L, W, 8, 128) f32 whose bits pack the two
    features as bf16 (f0 in the high half, f1 in the low half)."""
    L, S, F = grid.shape
    assert F == 2
    g = np.asarray(grid, np.float32)
    f0 = g[..., 0].astype(np.dtype("bfloat16") if hasattr(np, "bfloat16")
                          else np.float32)
    # bf16 = upper 16 bits of f32 (round-to-nearest-even on the cast)
    b0 = (np.frombuffer(np.ascontiguousarray(g[..., 0]).tobytes(),
                        np.uint32).reshape(L, S) + 0x8000) >> 16
    b1 = (np.frombuffer(np.ascontiguousarray(g[..., 1]).tobytes(),
                        np.uint32).reshape(L, S) + 0x8000) >> 16
    packed = (b0.astype(np.uint32) << 16) | b1.astype(np.uint32)
    packed = packed.reshape(L, S // BLOCK, ROWS, 128)
    return jnp.asarray(packed.view(np.float32))


def _encode_kernel(scales_ref, x_ref, y_ref, z_ref, tab_ref, out_ref, *,
                   n_levels: int, n_windows: int, mask: int):
    xs = x_ref[:]          # (ROWS, 128)
    ys = y_ref[:]
    zs = z_ref[:]

    def level_body(lvl, _):
        scale = scales_ref[lvl]
        px = xs * scale + 0.5
        py = ys * scale + 0.5
        pz = zs * scale + 0.5
        ix = jnp.floor(px)
        iy = jnp.floor(py)
        iz = jnp.floor(pz)
        fx = px - ix
        fy = py - iy
        fz = pz - iz
        ix = ix.astype(jnp.int32)
        iy = iy.astype(jnp.int32)
        iz = iz.astype(jnp.int32)

        acc0 = jnp.zeros((ROWS, 128), jnp.float32)
        acc1 = jnp.zeros((ROWS, 128), jnp.float32)
        for corner in range(8):
            bx, by, bz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            cx = (ix + bx).astype(jnp.uint32)
            cy = (iy + by).astype(jnp.uint32)
            cz = (iz + bz).astype(jnp.uint32)
            h = ((cx * jnp.uint32(C.HASH_PRIMES[0]))
                 ^ (cy * jnp.uint32(C.HASH_PRIMES[1]))
                 ^ (cz * jnp.uint32(C.HASH_PRIMES[2]))) & jnp.uint32(mask)
            h = h.astype(jnp.int32)
            lane = h & 127
            sub = (h >> 7) & 7
            win = h >> 10

            w = ((fx if bx else (1.0 - fx))
                 * (fy if by else (1.0 - fy))
                 * (fz if bz else (1.0 - fz)))

            rows = []
            for r in range(ROWS):
                cb = jnp.broadcast_to(lane[r:r + 1], (8, 128))
                rb = jnp.broadcast_to(sub[r:r + 1], (8, 128))
                wr = win[r:r + 1]                              # (1,128)
                row_bits = jnp.zeros((1, 128), jnp.int32)

                def win_body(wi, row_bits):
                    t8 = tab_ref[lvl, wi]                      # (8,128) f32
                    g = jnp.take_along_axis(t8, cb, axis=1)
                    v8 = pltpu.bitcast(
                        jnp.take_along_axis(g, rb, axis=0), jnp.int32)
                    return jnp.where(wr == wi, v8[0:1], row_bits)

                rows.append(jax.lax.fori_loop(0, n_windows, win_body,
                                              row_bits))
            val_bits = jnp.concatenate(rows, axis=0)           # (ROWS,128)

            # unpack bf16 pair: f0 = high 16 bits, f1 = low 16 bits
            v0 = pltpu.bitcast(val_bits & jnp.int32(-65536), jnp.float32)
            v1 = pltpu.bitcast(val_bits << 16, jnp.float32)
            acc0 = acc0 + w * v0
            acc1 = acc1 + w * v1

        out_ref[2 * lvl] = acc0
        out_ref[2 * lvl + 1] = acc1
        return 0

    jax.lax.fori_loop(0, n_levels, level_body, 0)


@partial(jax.jit, static_argnames=("config", "interpret"))
def hash_encode_pallas(table_packed: jnp.ndarray, pos: jnp.ndarray,
                       config: NGPConfig, interpret: bool = False
                       ) -> jnp.ndarray:
    """table_packed: pack_table output; pos: (N, 3) in [0,1], N % 1024 == 0.
    -> (N, L*F) float32 features (bf16-quantized values)."""
    L = config.n_levels
    S = 1 << config.log2_hashmap_size
    n_windows = S // BLOCK
    N = pos.shape[0]
    assert N % BLOCK == 0, N
    n_blocks = N // BLOCK

    scales = jnp.asarray(
        [grid_scale(l, config.log2_per_level_scale, config.base_resolution)
         for l in range(L)], jnp.float32)

    planes = [pos[:, i].reshape(n_blocks * ROWS, 128) for i in range(3)]

    kern = partial(_encode_kernel, n_levels=L, n_windows=n_windows,
                   mask=S - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ROWS, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, n_windows, 8, 128), lambda i, s: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * L, ROWS, 128),
                               lambda i, s: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2 * L, n_blocks * ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
    )(scales, planes[0], planes[1], planes[2], table_packed)

    # (2L, N/128, 128) -> (N, 2L), level-major feature order
    return out.reshape(2 * L, N).T
