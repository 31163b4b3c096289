"""Fused Pallas TPU kernel for one flash-march epoch.

The flash path's chunk epoch is [advance pass; R x K-sample vectorized
round] with ZERO network evals (baked sigma + deferred shading). In XLA
that is ~24 sequential skip-grid gather iterations plus a ~30-op
vectorized round whose sigma comes from a brick-table gather out of HBM
(ops/bake.pack_sigma_bricks) — all billed at per-op dispatch cost, the
measured currency of this TPU.

This kernel runs the WHOLE epoch for a chunk as one dispatch with both
acceleration structures resident in VMEM:
  - the 2 MB 128^3 uint8 empty-space jump grid (occupancy.build_skip_grid)
  - an 8 MB 128^3 float32 baked-density grid in linear [z,y,x] layout
    (row = z*128 + y, lane = x: a trilinear lookup is 4 row gathers + 8
    lane selects, all VMEM-local)

Semantics are exactly raymarch._advance_pass followed by
rounds_per_epoch x raymarch._march_round restricted to the flash fast
path (asserted by the caller): cone_angle == 0, single cascade,
use_baked_sigma + deferred_color + vector_rounds, chunk == BLOCK. The
only numeric deviation is the baked-density source: a 128^3 grid
sampled directly instead of the brick-packed grid at bake resolution
(the flash PSNR gates in bench.py bound the difference; measured on the
bench head, bake(128) holds 38.6 dB vs bake(256)'s 38.7 dB because the
flash path's other approximations dominate).

March semantics per the reference: advance_pos_nerf (testbed.cu:470-537)
for the advance; composite_kernel_nerf (testbed.cu:784-905) for the
round, including the in-march surface blend once t crosses t_surface
(:843-857) and the terminal blend of unconsumed surface color weighted
by remaining transmittance (:886-897).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_glasses_tpu import constants as C

G = C.NERF_GRIDSIZE          # 128: skip grid AND sigma grid resolution
SIG_R = 128
BLOCK = 2048                 # rays per kernel call == march chunk
ROWS = BLOCK // 128

# channel layout of the packed state input (CHANS, ROWS, 128) f32
_IN = ("ox", "oy", "oz", "dx", "dy", "dz",
       "o2x", "o2y", "o2z", "d2x", "d2y", "d2z",   # sigma-space affine
       "t", "t_surf", "t_exit",
       "sr", "sg", "sb", "sa",                     # surface payload rgba
       "surf_a", "alive",
       "r", "g", "b", "a", "depth", "max_weight", "wn")
CHANS = len(_IN)
_OUT = ("t", "alive", "surf_a", "r", "g", "b", "a",
        "depth", "max_weight", "wn")


def _gather_u8(ref, flat):
    """(G^3/128, 128) ref gathered at flat (ROWS, 128) int32 ids."""
    rows = jnp.take(ref[:], (flat >> 7).reshape(-1), axis=0)
    v = jnp.take_along_axis(rows, (flat & 127).reshape(-1, 1), axis=1)
    return v.reshape(flat.shape).astype(jnp.int32)


def _kernel(skip_ref, sig_ref, st_ref, out_ref, *, adv_iters: int,
            rounds: int, K: int, dt: float, min_t: float, occ_gate: bool,
            epochs: int = 1):
    s = {k: st_ref[i] for i, k in enumerate(_IN)}
    ox, oy, oz = s["ox"], s["oy"], s["oz"]
    dx, dy, dz = s["dx"], s["dy"], s["dz"]
    t_surf = s["t_surf"]
    t_exit = s["t_exit"]
    has_surface = t_surf > 0.0

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

    def skip_at(px, py, pz):
        return _gather_u8(skip_ref, (cell(pz) * G + cell(py)) * G + cell(px))

    def sigma_at(p1, p2, p3):
        """Trilinear sample of the VMEM sigma grid at pos01 components."""
        R = SIG_R

        def prep(p):
            q = jnp.clip(p, 0.0, 1.0) * R - 0.5
            i0 = jnp.clip(jnp.trunc(q).astype(jnp.int32), 0, R - 2)
            return i0, jnp.clip(q - i0.astype(jnp.float32), 0.0, 1.0)

        ix, fx = prep(p1)
        iy, fy = prep(p2)
        iz, fz = prep(p3)
        lane0 = ix.reshape(-1, 1)
        lane1 = lane0 + 1

        def corners(dz_, dy_):
            rows = jnp.take(sig_ref[:],
                            ((iz + dz_) * R + iy + dy_).reshape(-1), axis=0)
            c0 = jnp.take_along_axis(rows, lane0, axis=1).reshape(ix.shape)
            c1 = jnp.take_along_axis(rows, lane1, axis=1).reshape(ix.shape)
            return c0 * (1.0 - fx) + c1 * fx

        c00 = corners(0, 0)
        c10 = corners(0, 1)
        c01 = corners(1, 0)
        c11 = corners(1, 1)
        c0 = c00 * (1.0 - fy) + c10 * fy
        c1 = c01 * (1.0 - fy) + c11 * fy
        return c0 * (1.0 - fz) + c1 * fz

    def advance_body(_, carry):
        t, alive, settled, surf_live = carry
        active = ~settled & alive
        px = ox + dx * t
        py = oy + dy * t
        pz = oz + dz * t
        lv = skip_at(px, py, pz)
        occ = lv == 255
        res = (G >> jnp.minimum(lv, 4)).astype(jnp.float32)
        prx = res * px
        pry = res * py
        prz = res * pz
        ttx = (jnp.floor(prx + 0.5 + 0.5 * sx) - prx) * idx
        tty = (jnp.floor(pry + 0.5 + 0.5 * sy) - pry) * idy
        ttz = (jnp.floor(prz + 0.5 + 0.5 * sz) - prz) * idz
        dist = jnp.maximum(
            jnp.minimum(jnp.minimum(ttx, tty), ttz) / res, 0.0)
        adv = t + jnp.maximum(jnp.ceil(dist / fdt), 1.0) * fdt

        surf_pending = surf_live & (t >= t_surf)
        inside = t <= t_exit
        newly_park = active & (surf_pending | (~inside & surf_live))
        newly_exit = active & ~surf_pending & ~inside & ~surf_live
        newly_hit = active & ~surf_pending & inside & occ
        t = jnp.where(newly_park, t_surf, t)
        alive = alive & ~newly_exit
        settled = settled | newly_park | newly_hit | ~alive
        t = jnp.where(~settled & alive, adv, t)
        return t, alive, settled, surf_live

    def round_body(st):
        """One K-sample vectorized round (raymarch._march_round, flash
        options), computed sequentially over the K slots with the same
        accumulation order as the XLA closed form."""
        t0 = st["t"]
        alive = st["alive"]
        surf_a0 = st["surf_a"]
        rgba_a = st["a"]

        # sample-slot status flags, aggregated over the K slots
        surf_stopped = jnp.zeros_like(alive)
        any_outside = jnp.zeros_like(alive)
        for i in range(K):
            t_i = t0 + fdt * i
            surf_stopped |= (has_surface & (t_i > t_surf)
                             & (surf_a0 >= 1.0))
            any_outside |= t_i > t_exit
        surf_stopped &= alive
        exited = any_outside & alive & ~surf_stopped
        t_end = jnp.where(alive, jnp.where(surf_stopped, t_surf,
                                           t0 + K * fdt), t0)

        # in-march surface blend (fires once, before the samples)
        t_payload = jnp.where(exited, t0,
                              jnp.where(surf_stopped, t_surf, t_end))
        trigger = (alive & has_surface & (t_payload > t_surf)
                   & (surf_a0 > 0.0))
        T = 1.0 - rgba_a
        bw = jnp.where(trigger, surf_a0 * T, 0.0)
        r = st["r"] + s["sr"] * bw
        g = st["g"] + s["sg"] * bw
        b = st["b"] + s["sb"] * bw
        rgba_a = rgba_a + bw
        surf_a = jnp.where(trigger, 0.0, surf_a0)
        sat = trigger & (rgba_a > 0.99)
        inv = jnp.where(sat, 1.0 / jnp.maximum(rgba_a, 1e-9), 1.0)
        r = r * inv
        g = g * inv
        b = b * inv
        rgba_a = rgba_a * inv
        wn = st["wn"] * inv
        comp_alive = alive & ~sat

        # K deferred-shading samples: alpha from the VMEM sigma grid,
        # composited front-to-back in the XLA vector round's op order
        # (w = alpha * T0 * exclusive-transmittance; a_cum runs over the
        # UNblocked w; samples after the first threshold crossing are
        # dropped)
        T0 = 1.0 - rgba_a
        texcl = jnp.ones_like(T0)
        a_cum = rgba_a
        blocked = jnp.zeros_like(alive)
        saturated = jnp.zeros_like(alive)
        w_sum = jnp.zeros_like(T0)
        max_w = st["max_weight"]
        w_best = jnp.zeros_like(T0)   # round-local best (XLA argmax on w)
        t_best = jnp.zeros_like(T0)
        for i in range(K):
            t_i = t0 + fdt * i
            valid = (t_i <= t_exit) & ~(has_surface & (t_i > t_surf)
                                        & (surf_a0 >= 1.0)) & alive
            if occ_gate:
                valid &= skip_at(ox + dx * t_i, oy + dy * t_i,
                                 oz + dz * t_i) == 255
            sig = sigma_at(s["o2x"] + s["d2x"] * t_i,
                           s["o2y"] + s["d2y"] * t_i,
                           s["o2z"] + s["d2z"] * t_i)
            alpha = jnp.where(valid, 1.0 - jnp.exp(-sig * fdt), 0.0)
            use = comp_alive & valid
            alpha_u = jnp.where(use, alpha, 0.0)
            w_all = alpha_u * T0 * texcl
            a_cum = a_cum + w_all
            done = use & (a_cum > 1.0 - jnp.float32(min_t))
            w = jnp.where(blocked, 0.0, w_all)
            w_sum = w_sum + w
            upd = w > w_best
            w_best = jnp.where(upd, w, w_best)
            t_best = jnp.where(upd, t_i, t_best)
            saturated |= done & ~blocked
            blocked |= done
            texcl = texcl * (1.0 - alpha_u)
        rgba_a = rgba_a + w_sum
        wn = wn + w_sum
        upd = w_best > max_w
        max_w = jnp.where(upd, w_best, max_w)
        depth = jnp.where(upd, t_best, st["depth"])
        inv = jnp.where(saturated, 1.0 / jnp.maximum(rgba_a, 1e-9), 1.0)
        r = r * inv
        g = g * inv
        b = b * inv
        rgba_a = rgba_a * inv
        wn = wn * inv
        comp_alive = comp_alive & ~saturated

        # terminal blend of unconsumed surface color (testbed.cu:886-897)
        terminated = exited | surf_stopped
        fin = comp_alive & terminated & (surf_a > 0.0)
        rem = jnp.where(fin, 1.0 - rgba_a, 0.0)
        r = r + s["sr"] * rem
        g = g + s["sg"] * rem
        b = b + s["sb"] * rem
        rgba_a = rgba_a + s["sa"] * rem
        comp_alive = comp_alive & ~terminated

        return {"t": t_end, "alive": comp_alive, "surf_a": surf_a,
                "r": r, "g": g, "b": b, "a": rgba_a, "depth": depth,
                "max_weight": max_w, "wn": wn}

    st = {k: s[k] for k in _OUT}
    st["alive"] = st["alive"] > 0.5
    # epoch = advance pass, then rounds_per_epoch rounds; `epochs`
    # internal repeats trade (masked) kernel work for outer-loop
    # compaction/scatter traffic
    for _ in range(epochs):
        surf_live = has_surface & (st["surf_a"] > 0.0)
        t, alive, _, _ = jax.lax.fori_loop(
            0, adv_iters, advance_body,
            (st["t"], st["alive"], ~st["alive"], surf_live))
        st["t"] = t
        st["alive"] = alive
        for _ in range(rounds):
            st = round_body(st)
    for i, k in enumerate(_OUT):
        v = st[k]
        out_ref[i] = v.astype(jnp.float32) if v.dtype == jnp.bool_ else v


@partial(jax.jit, static_argnames=("adv_iters", "rounds", "K", "dt",
                                   "min_t", "occ_gate", "epochs",
                                   "interpret"))
def flash_epoch_pallas(skip2d, sig2d, state, adv_iters: int, rounds: int,
                       K: int, dt: float, min_t: float, occ_gate: bool,
                       epochs: int = 1, interpret: bool = False):
    """skip2d: (G^3/128, 128) uint8; sig2d: (SIG_R^3/128, 128) f32 linear
    [z,y,x] baked density; state: (CHANS, ROWS, 128) f32 per `_IN`.
    -> (len(_OUT), ROWS, 128) f32."""
    return pl.pallas_call(
        partial(_kernel, adv_iters=adv_iters, rounds=rounds, K=K, dt=dt,
                min_t=min_t, occ_gate=occ_gate, epochs=epochs),
        out_shape=jax.ShapeDtypeStruct((len(_OUT), ROWS, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(skip2d, sig2d, state)


def pack_state(st, scene, t_exit):
    """Chunk ray-state dict (BLOCK rays) -> (CHANS, ROWS, 128) f32."""
    o, d = st["o"], st["d"]
    ext = scene["train_max"] - scene["train_min"]
    o2 = (o - scene["train_min"]) / ext
    d2 = d / ext
    surf = st["surf"]
    chans = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2],
             st["t"], st["t_surf"], t_exit,
             surf[:, 0], surf[:, 1], surf[:, 2], surf[:, 3],
             st["surf_a"], st["alive"].astype(jnp.float32),
             st["rgba"][:, 0], st["rgba"][:, 1], st["rgba"][:, 2],
             st["rgba"][:, 3], st["depth"], st["max_weight"], st["wn"]]
    return jnp.stack([c.reshape(ROWS, 128) for c in chans])


# test hook: run the kernel in interpret mode even when called through
# the product march path (march_frame wiring tests on CPU)
FORCE_INTERPRET = False


def flash_epoch_pass(st, scene, opts, interpret: bool = False):
    """Drop-in for [_advance_pass; rounds_per_epoch x _march_round] on
    the flash fast path. st holds BLOCK rays; requires
    scene["sigma_lin"] ((SIG_R^3/128, 128) f32)."""
    from nerf_glasses_tpu.ops import raymarch
    interpret = interpret or FORCE_INTERPRET
    t_exit = raymarch._ray_exit_t(st["o"], st["d"], scene)
    out = flash_epoch_pallas(
        scene["skip"].reshape(-1, 128), scene["sigma_lin"],
        pack_state(st, scene, t_exit), opts.advance_iters,
        opts.rounds_per_epoch, opts.steps_per_round,
        float(C.MIN_CONE_STEPSIZE), float(opts.min_transmittance),
        bool(opts.vector_occ_gate), epochs=opts.pallas_flash_epochs,
        interpret=interpret)
    n = lambda i: out[i].reshape(-1)
    return {**st, "t": n(0), "alive": n(1) > 0.5, "surf_a": n(2),
            "rgba": jnp.stack([n(3), n(4), n(5), n(6)], axis=-1),
            "depth": n(7), "max_weight": n(8), "wn": n(9)}
