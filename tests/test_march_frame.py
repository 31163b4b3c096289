"""march_frame (compacting, single-dispatch) must match march_rays."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu.ops import raymarch
from tests.test_raymarch import CFG, OPTS, make_scene, zero_params


def test_march_frame_matches_tile_api():
    params = zero_params()
    scene = make_scene(occ_full=True)
    n = 256
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0.5, 0.5, -1.0]], np.float32), (n, 1))
    o[:, :2] += rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf = np.zeros((n, 4), np.float32)
    tsurf = np.zeros((n,), np.float32)
    # give some rays a mesh surface to exercise the gating paths
    surf[::7] = [0.8, 0.1, 0.1, 1.0]
    tsurf[::7] = 1.6
    surf[1::7] = [0.2, 0.9, 0.2, 0.5]
    tsurf[1::7] = 1.4

    oj, dj = jnp.asarray(o), jnp.asarray(d)
    sj, tj = jnp.asarray(surf), jnp.asarray(tsurf)

    ref = raymarch.march_rays(params, scene, oj, dj, sj, tj, OPTS)
    fopts = dataclasses.replace(OPTS, chunk=64, rounds_per_epoch=2)
    out = raymarch.march_frame(params, scene, oj, dj, sj, tj, fopts)

    np.testing.assert_allclose(np.asarray(out["rgba"]),
                               np.asarray(ref["rgba"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=1e-4)
