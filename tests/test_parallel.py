"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.ops.network import init_params
from nerf_glasses_tpu.parallel import sharding
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

from tests.test_raymarch import CFG, OPTS, make_scene, straight_rays, \
    zero_params
from tests.test_training import TINY_CFG, make_synth_dataset


def test_mesh_has_8_devices():
    mesh = sharding.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_march_matches_single_device():
    params = zero_params()
    scene = make_scene(occ_full=True)
    n = 16
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    surf = jnp.zeros((n, 4))
    ts = jnp.zeros((n,))

    ref = raymarch.march_rays(params, scene, o, d, surf, ts, OPTS)

    mesh = sharding.make_mesh()
    fn = sharding.make_sharded_march(mesh, OPTS)
    with mesh:
        rgba, depth = fn(params, scene, o, d, surf, ts)
    np.testing.assert_allclose(np.asarray(rgba), np.asarray(ref["rgba"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]),
                               atol=1e-5)


def test_render_image_sharded():
    params = zero_params()
    scene = make_scene(occ_full=True)
    cam = np.array([[1.1, 0.0, 0.0, 0.0],
                    [0.0, 1.1, 0.0, 0.0],
                    [0.0, 0.0, -1.0, 2.0]], np.float32)
    mesh = sharding.make_mesh()
    rgba, depth = sharding.render_image_sharded(
        params, scene, cam, 20, 12, OPTS, mesh)  # 240 pixels = 8*30
    assert rgba.shape == (12, 20, 4)
    assert np.isfinite(rgba).all()
    assert rgba[6, 10, 3] > 0.5


def test_sharded_train_step_runs_and_decreases_loss():
    # dense occupancy (no grid warmup) + exponential stepping so the
    # fixed sample budget spans the whole cube
    opts = TrainOptions(config=TINY_CFG, rays_per_batch=512,
                        samples_per_ray=96, grid_samples_per_update=1 << 12,
                        cone_angle=1.0 / 64, compute_dtype="float32")
    ds = make_synth_dataset(n_images=4)
    mesh = sharding.make_mesh()
    tr = sharding.ShardedTrainer(ds, opts, mesh=mesh)
    tr.occ_warmup_steps = 1 << 30  # keep occ dense for this smoke test
    losses_early = [tr.train(1) for _ in range(5)]
    tr.train(60)
    losses_late = [tr.train(1) for _ in range(5)]
    assert np.isfinite(losses_late).all()
    assert np.mean(losses_late) < np.mean(losses_early) * 0.8
