"""Equivalence: Pallas advance kernel vs the XLA _advance_pass."""

import numpy as np
import jax.numpy as jnp
import pytest

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.ops.advance_pallas import (BLOCK, advance_pass_pallas)


def _random_state(seed, with_surface=True):
    rng = np.random.default_rng(seed)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    # a few occupied blobs of varying size
    for _ in range(6):
        c = rng.integers(16, 112, size=3)
        r = rng.integers(2, 14)
        g = np.arange(128)
        zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
        occ[0] |= ((xx - c[0]) ** 2 + (yy - c[1]) ** 2
                   + (zz - c[2]) ** 2 < r * r).astype(np.uint8)
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    o = rng.uniform(-0.2, 1.2, size=(BLOCK, 3)).astype(np.float32)
    d = rng.normal(size=(BLOCK, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.uniform(0.0, 0.5, size=(BLOCK,)).astype(np.float32)
    if with_surface:
        t_surf = np.where(rng.uniform(size=BLOCK) < 0.4,
                          rng.uniform(0.1, 1.0, size=BLOCK), 0.0
                          ).astype(np.float32)
        surf_a = rng.uniform(0.0, 1.0, size=BLOCK).astype(np.float32)
    else:
        t_surf = np.zeros(BLOCK, np.float32)
        surf_a = np.zeros(BLOCK, np.float32)
    alive = rng.uniform(size=BLOCK) < 0.9
    st = {
        "o": jnp.asarray(o), "d": jnp.asarray(d), "t": jnp.asarray(t),
        "t_surf": jnp.asarray(t_surf), "surf_a": jnp.asarray(surf_a),
        "t_start": jnp.zeros(BLOCK), "alive": jnp.asarray(alive),
        "surf": jnp.zeros((BLOCK, 4)),
        "rgba": jnp.zeros((BLOCK, 4)), "depth": jnp.zeros(BLOCK),
        "max_weight": jnp.zeros(BLOCK), "wn": jnp.zeros(BLOCK),
    }
    return st, scene


@pytest.mark.parametrize("seed,with_surface", [(0, True), (1, False),
                                               (2, True)])
def test_matches_xla_advance(seed, with_surface):
    st, scene = _random_state(seed, with_surface)
    opts = raymarch.MarchOptions(config=NGPConfig(), cone_angle=0.0,
                                 jitter=False)
    iters = 24

    ref = raymarch._advance_pass(dict(st), scene, opts, iters)
    t_exit = raymarch._ray_exit_t(st["o"], st["d"], scene)
    out = advance_pass_pallas(dict(st), scene, iters,
                              float(raymarch.occ_ops.calc_dt(
                                  jnp.zeros(()), 0.0)), t_exit,
                              interpret=True)

    np.testing.assert_array_equal(np.asarray(ref["alive"]),
                                  np.asarray(out["alive"]))
    np.testing.assert_allclose(np.asarray(ref["t"]), np.asarray(out["t"]),
                               rtol=1e-6, atol=1e-6)
