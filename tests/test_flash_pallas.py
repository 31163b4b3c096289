"""Equivalence: fused Pallas flash epoch vs the XLA advance+round path.

The kernel's density source is the same 128^3 grid the XLA path's brick
table is packed from, so the two paths compute the same math with
different float op order — comparisons use tolerances and allow a tiny
fraction of threshold-crossing flips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.ops.bake import pack_sigma_bricks
from nerf_glasses_tpu.ops.flash_pallas import BLOCK, flash_epoch_pass
from nerf_glasses_tpu.ops.network import init_params


def _scene_and_state(seed, with_surface):
    rng = np.random.default_rng(seed)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    for _ in range(5):
        c = rng.integers(20, 108, size=3)
        r = rng.integers(3, 16)
        g = np.arange(128)
        zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
        occ[0] |= ((xx - c[0]) ** 2 + (yy - c[1]) ** 2
                   + (zz - c[2]) ** 2 < r * r).astype(np.uint8)
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    # smooth random density, zeroed outside occupancy (as bake() does)
    base = rng.uniform(0.0, 30.0, size=(16, 16, 16)).astype(np.float32)
    grid = np.repeat(np.repeat(np.repeat(base, 8, 0), 8, 1), 8, 2)
    grid *= occ[0].astype(np.float32)
    scene["sigma"] = pack_sigma_bricks(grid)
    scene["sigma_lin"] = jnp.asarray(grid.reshape(-1, 128))

    o = rng.uniform(-0.2, 1.2, size=(BLOCK, 3)).astype(np.float32)
    d = rng.normal(size=(BLOCK, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if with_surface:
        t_surf = np.where(rng.uniform(size=BLOCK) < 0.4,
                          rng.uniform(0.05, 1.2, size=BLOCK), 0.0
                          ).astype(np.float32)
        surf = rng.uniform(0.0, 1.0, size=(BLOCK, 4)).astype(np.float32)
        surf[:, 3] = np.where(rng.uniform(size=BLOCK) < 0.3, 1.0,
                              surf[:, 3])
        surf = np.where(t_surf[:, None] > 0, surf, 0.0).astype(np.float32)
    else:
        t_surf = np.zeros(BLOCK, np.float32)
        surf = np.zeros((BLOCK, 4), np.float32)
    alive = rng.uniform(size=BLOCK) < 0.9
    st = {
        "o": jnp.asarray(o), "d": jnp.asarray(d),
        "t": jnp.asarray(rng.uniform(0.0, 0.6, size=BLOCK
                                     ).astype(np.float32)),
        "t_surf": jnp.asarray(t_surf), "surf": jnp.asarray(surf),
        "surf_a": jnp.asarray(np.where(alive, surf[:, 3], 0.0)),
        "t_start": jnp.zeros(BLOCK), "alive": jnp.asarray(alive),
        "rgba": jnp.asarray(
            rng.uniform(0, 0.3, size=(BLOCK, 4)).astype(np.float32)),
        "depth": jnp.zeros(BLOCK),
        "max_weight": jnp.zeros(BLOCK), "wn": jnp.zeros(BLOCK),
    }
    return st, scene


def _xla_epoch(st, scene, opts, params):
    sub = raymarch._advance_pass(dict(st), scene, opts, opts.advance_iters)
    for _ in range(opts.rounds_per_epoch):
        sub = raymarch._march_round(sub, params, scene, opts)
    return sub


@pytest.mark.parametrize("seed,with_surface,occ_gate,rounds,epochs", [
    (0, True, False, 1, 1), (1, False, False, 1, 1), (2, True, True, 1, 1),
    (3, True, False, 2, 1), (4, True, False, 1, 3)])
def test_matches_xla_epoch(seed, with_surface, occ_gate, rounds, epochs):
    st, scene = _scene_and_state(seed, with_surface)
    cfg = NGPConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opts = raymarch.MarchOptions(
        config=cfg, cone_angle=0.0, jitter=False, use_baked_sigma=True,
        deferred_color=True, vector_rounds=True, steps_per_round=16,
        advance_iters=24, rounds_per_epoch=rounds, chunk=BLOCK,
        vector_occ_gate=occ_gate, compute_dtype="float32",
        pallas_flash_epochs=epochs)

    ref = dict(st)
    for _ in range(epochs):   # E internal epochs == E XLA epochs
        ref = _xla_epoch(ref, scene, opts, params)
    out = flash_epoch_pass(dict(st), scene, opts, interpret=True)

    n = BLOCK
    # threshold crossings (early-termination, saturation) can flip on
    # 1-ulp differences; bound the flip fraction, then compare the rest
    flips = np.flatnonzero(np.asarray(ref["alive"])
                           != np.asarray(out["alive"]))
    assert len(flips) <= n // 500, f"{len(flips)} alive flips"
    ok = np.ones(n, bool)
    ok[flips] = False
    for k, tol in [("t", 1e-5), ("rgba", 2e-5), ("wn", 2e-5),
                   ("surf_a", 1e-6), ("depth", 1e-4), ("max_weight", 2e-5)]:
        a = np.asarray(ref[k])[ok]
        b = np.asarray(out[k])[ok]
        bad = ~np.isclose(a, b, rtol=1e-4, atol=tol)
        frac = bad.mean()
        assert frac <= 0.002, (k, frac, a[bad][:5], b[bad][:5])


def test_march_frame_wiring(monkeypatch):
    """The kernel path inside march_frame (chunk gather/scatter + gate)
    must reproduce the XLA frame on a one-chunk flash-style frame."""
    import jax as _jax
    from nerf_glasses_tpu.ops import flash_pallas

    st, scene = _scene_and_state(7, True)
    cfg = NGPConfig(n_levels=2, log2_hashmap_size=8, base_resolution=4)
    params = init_params(jax.random.PRNGKey(0), cfg)

    def run(pallas):
        opts = raymarch.MarchOptions(
            config=cfg, cone_angle=0.0, jitter=False, use_baked_sigma=True,
            deferred_color=True, vector_rounds=True, steps_per_round=16,
            advance_iters=24, chunk=BLOCK, max_rounds=8,
            vector_occ_gate=False, compute_dtype="float32",
            pallas_flash=pallas)
        return raymarch.march_frame_impl(
            params, scene, st["o"], st["d"], st["surf"], st["t_surf"],
            opts)

    ref = run(False)
    monkeypatch.setattr(flash_pallas, "FORCE_INTERPRET", True)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    out = run(True)
    for k in ("rgba", "depth"):
        a, b = np.asarray(ref[k]), np.asarray(out[k])
        bad = ~np.isclose(a, b, rtol=1e-4, atol=5e-5)
        assert bad.mean() <= 0.002, (k, bad.mean())
