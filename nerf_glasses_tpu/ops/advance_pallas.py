"""Pallas TPU kernel for the per-epoch empty-space advance pass.

The XLA `_advance_pass` (ops/raymarch.py) runs `advance_iters`
*sequential* DDA iterations per compacted chunk; each iteration is one
(N,) random gather into the skip grid plus a fused elementwise chain —
~3 us/iteration at N=2048, and at 720p epoch 1 walks ~450 chunks, so
the pass costs ~35 ms of a ~140 ms hybrid flash frame.

This kernel runs the whole advance for a chunk as ONE op with the
2 MB skip grid (128^3 uint8) resident in VMEM, so each of the `iters`
rounds is a VMEM gather + vreg arithmetic with zero dispatch overhead.

Semantics are exactly `_advance_pass` restricted to its fast-path
preconditions (asserted by the caller):
  - cone_angle == 0 (constant dt stepping, the aabb_scale==1 reference
    default — testbed.cu:303-315 closed form),
  - single cascade with a jump grid (`scene["skip"]`, see
    ops/occupancy.py:build_skip_grid),
  - chunk size == BLOCK rays.

State machine per iteration (advance_pos_nerf, testbed.cu:470-537):
park at t_surface when the payload crosses a live mesh surface, die on
clean aabb exit, settle at the first occupied skip-grid cell, else jump
to the boundary of the coarsest empty block (quantized to dt steps).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_glasses_tpu import constants as C

G = C.NERF_GRIDSIZE          # 128
BLOCK = 2048                 # rays per kernel call == march chunk
ROWS = BLOCK // 128          # 16 sublanes of 128 lanes

# channel layout of the packed state input (CHANS, ROWS, 128) f32
_IN = ("ox", "oy", "oz", "dx", "dy", "dz", "t", "t_surf", "t_exit",
       "alive", "settled", "surf_live")
CHANS = len(_IN)


def _gather_skip(skip_ref, flat):
    """flat (ROWS, 128) int32 voxel ids -> (ROWS, 128) int32 levels.

    The grid is laid out (G*G*G/128, 128) uint8; gather the row vector
    per element, then select the lane.  Mosaic lowers the row gather
    (jnp.take along axis 0) and the lane select (take_along_axis on the
    minor axis) to native dynamic-gather ops.
    """
    row = flat >> 7
    lane = flat & 127
    rows = jnp.take(skip_ref[:], row.reshape(-1), axis=0)   # (BLOCK, 128) u8
    v = jnp.take_along_axis(rows, lane.reshape(-1, 1), axis=1)
    return v.reshape(flat.shape).astype(jnp.int32)


def _kernel(skip_ref, st_ref, out_ref, *, iters: int, dt: float):
    ox, oy, oz = st_ref[0], st_ref[1], st_ref[2]
    dx, dy, dz = st_ref[3], st_ref[4], st_ref[5]
    t0 = st_ref[6]
    t_surf = st_ref[7]
    t_exit = st_ref[8]
    alive0 = st_ref[9] > 0.5
    settled0 = st_ref[10] > 0.5
    surf_live = st_ref[11] > 0.5

    idx = 1.0 / dx
    idy = 1.0 / dy
    idz = 1.0 / dz
    sx = jnp.sign(dx) + (dx == 0.0)
    sy = jnp.sign(dy) + (dy == 0.0)
    sz = jnp.sign(dz) + (dz == 0.0)
    fdt = jnp.float32(dt)
    fG = jnp.float32(G)

    def cell(p):
        return jnp.clip(jnp.trunc(p * fG).astype(jnp.int32), 0, G - 1)

    def body(_, carry):
        t, alive, settled = carry
        active = ~settled & alive
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t

        lv = _gather_skip(skip_ref,
                          (cell(pz) * G + cell(py)) * G + cell(px))
        occ = lv == 255
        res = (G >> jnp.minimum(lv, 4)).astype(jnp.float32)

        # distance_to_next_voxel (DDA, occupancy.py:126-132) at block res
        prx = res * px
        pry = res * py
        prz = res * pz
        ttx = (jnp.floor(prx + 0.5 + 0.5 * sx) - prx) * idx
        tty = (jnp.floor(pry + 0.5 + 0.5 * sy) - pry) * idy
        ttz = (jnp.floor(prz + 0.5 + 0.5 * sz) - prz) * idz
        dist = jnp.maximum(jnp.minimum(jnp.minimum(ttx, tty), ttz) / res,
                           0.0)
        n = jnp.maximum(jnp.ceil(dist / fdt), 1.0)
        adv = t + n * fdt

        surf_pending = surf_live & (t >= t_surf)
        inside = t <= t_exit
        newly_park = active & (surf_pending | (~inside & surf_live))
        newly_exit = active & ~surf_pending & ~inside & ~surf_live
        newly_hit = active & ~surf_pending & inside & occ
        t = jnp.where(newly_park, t_surf, t)
        alive = alive & ~newly_exit
        settled = settled | newly_park | newly_hit | ~alive
        t = jnp.where(~settled & alive, adv, t)
        return t, alive, settled

    t, alive, settled = jax.lax.fori_loop(
        0, iters, body, (t0, alive0, settled0))
    out_ref[0] = t
    out_ref[1] = alive.astype(jnp.float32)
    out_ref[2] = settled.astype(jnp.float32)


@partial(jax.jit, static_argnames=("iters", "dt", "interpret"))
def advance_pallas(skip2d, state, iters: int, dt: float,
                   interpret: bool = False):
    """skip2d: (G^3/128, 128) uint8 jump grid; state: (CHANS, ROWS, 128)
    f32 packed per `_IN`. -> (3, ROWS, 128) f32 [t, alive, settled]."""
    return pl.pallas_call(
        partial(_kernel, iters=iters, dt=dt),
        out_shape=jax.ShapeDtypeStruct((3, ROWS, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(skip2d, state)


def pack_state(st, t_exit):
    """Ray-state dict (N=BLOCK rays) -> (CHANS, ROWS, 128) f32."""
    o, d = st["o"], st["d"]
    surf_live = (st["t_surf"] > 0.0) & (st["surf_a"] > 0.0)
    chans = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             st["t"], st["t_surf"], t_exit,
             st["alive"].astype(jnp.float32), 1.0 - st["alive"],
             surf_live.astype(jnp.float32)]
    return jnp.stack([c.reshape(ROWS, 128) for c in chans])


def advance_pass_pallas(st, scene, iters: int, dt: float, t_exit,
                        interpret: bool = False):
    """Drop-in for raymarch._advance_pass on the fast path. st holds
    BLOCK rays; t_exit precomputed by raymarch._ray_exit_t."""
    skip2d = scene["skip"].reshape(-1, 128)
    out = advance_pallas(skip2d, pack_state(st, t_exit), iters, dt,
                         interpret=interpret)
    return {**st, "t": out[0].reshape(-1),
            "alive": out[1].reshape(-1) > 0.5}
