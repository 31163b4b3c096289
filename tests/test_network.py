"""Tests: hash-grid encoding, SH encoding, MLP, param packing, snapshot IO."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.config import NGPConfig, grid_resolution, grid_scale
from nerf_glasses_tpu.ops import network as net
from nerf_glasses_tpu.ops.hashgrid import hash_encode, level_corner_indices
from nerf_glasses_tpu.ops.sh import sh_encode


SMALL = NGPConfig(n_levels=4, log2_hashmap_size=7, base_resolution=4,
                  per_level_scale=2.0)


def test_offset_table_matches_tcnn_formula():
    # standard config: L=16, T=2^19, Nmin=16, b for aabb_scale=1
    cfg = NGPConfig()
    lp = cfg.level_params()
    assert len(lp) == 16
    # level 0: scale = 16-1=15, res=16, dense 4096 -> 4096 rows
    assert lp[0][1:] == (4096, 16)
    # monotone offsets; hashed levels capped at 2^19
    for (off, size, res) in lp:
        assert size <= 1 << 19
        dense = res ** 3
        if dense <= (1 << 19):
            assert size == ((dense + 7) // 8) * 8
        else:
            assert size == 1 << 19
    # finest level resolution ~2048*aabb_scale
    assert 1024 <= lp[-1][2] <= 2200
    # parameter count matches: tcnn reports 12196240 total for this config
    # with 64x1 + 64x2 MLPs (grid 12M + mlps)
    d, r = cfg.mlp_shapes()
    assert d == ((64, 32), (16, 64))
    assert r == ((64, 32), (64, 64), (16, 64))


def test_hash_grid_dense_level_exact():
    """Dense level: encoding must equal hand-computed trilinear interp."""
    from nerf_glasses_tpu.ops.hashgrid import padded_table_rows
    cfg = SMALL
    lp = cfg.level_params()
    offset, size, res = lp[0]  # level 0: scale=3, res=5, dense
    assert res == grid_resolution(grid_scale(0, cfg.log2_per_level_scale,
                                             cfg.base_resolution))
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(
        (cfg.n_levels, padded_table_rows(cfg), 2)).astype(np.float32))

    pos = jnp.asarray(rng.uniform(0.02, 0.98, (16, 3)).astype(np.float32))
    out = np.asarray(hash_encode(table, pos, cfg))
    assert out.shape == (16, 8)

    # hand-computed for level 0
    scale = grid_scale(0, cfg.log2_per_level_scale, cfg.base_resolution)
    tab = np.asarray(table[0])
    for n in range(16):
        p = np.asarray(pos[n]) * scale + 0.5
        g = np.floor(p).astype(int)
        f = p - g
        acc = np.zeros(2)
        for corner in range(8):
            c = [(corner >> d) & 1 for d in range(3)]
            w = np.prod([f[d] if c[d] else 1 - f[d] for d in range(3)])
            idx = ((g[0] + c[0]) + (g[1] + c[1]) * res + (g[2] + c[2]) * res * res)
            idx %= size
            acc += w * tab[idx]
        np.testing.assert_allclose(out[n, :2], acc, rtol=1e-4, atol=1e-5)


def test_hash_grid_hashed_level_indices():
    """Hashed level: indices must use the coherent-prime XOR hash."""
    cfg = SMALL
    lvl = 3  # scale = 4*2^3-1 = 31, res = 32, dense 32768 > 128 -> hashed
    offset, size, res = cfg.level_params()[lvl]
    assert res ** 3 > size
    pos = jnp.asarray(np.array([[0.37, 0.81, 0.15]], np.float32))
    scale = grid_scale(lvl, cfg.log2_per_level_scale, cfg.base_resolution)
    idx, w = level_corner_indices(pos, res, scale, size)
    idx = np.asarray(idx)[0]
    p = np.asarray(pos)[0] * scale + 0.5
    g = np.floor(p).astype(np.uint32)
    for corner in range(8):
        c = np.array([(corner >> d) & 1 for d in range(3)], np.uint32)
        v = g + c
        expect = (v[0] * np.uint32(1)
                  ^ v[1] * np.uint32(2654435761)
                  ^ v[2] * np.uint32(805459861)) % np.uint32(size)
        assert idx[corner] == expect
    np.testing.assert_allclose(np.asarray(w).sum(), 1.0, rtol=1e-5)


def test_sh_encode_reference_values():
    # straight +z direction
    d = jnp.array([[0.5, 0.5, 1.0]])  # warped; unwarps to (0,0,1)
    out = np.asarray(sh_encode(d, 4, 16))[0]
    assert abs(out[0] - 0.28209479177387814) < 1e-6
    assert abs(out[2] - 0.48860251190291987) < 1e-6   # sqrt(3)z/(2 sqrt(pi))
    assert abs(out[1]) < 1e-6 and abs(out[3]) < 1e-6
    assert abs(out[6] - (0.94617469575755997 - 0.31539156525251999)) < 1e-6
    # orthonormality-ish sanity: integrate Y_l^m * Y_l'^m' over sphere ~ delta
    rng = np.random.default_rng(0)
    v = rng.standard_normal((20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sh = np.asarray(sh_encode(jnp.asarray((v + 1) / 2, jnp.float32), 4, 16))
    gram = sh.T @ sh / len(v) * (4 * np.pi)
    np.testing.assert_allclose(np.diag(gram), 1.0, atol=0.1)


def test_network_apply_and_pack_roundtrip():
    cfg = SMALL
    params = net.init_params(jax.random.PRNGKey(0), cfg)
    pos = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 3)), jnp.float32)
    dirs = jnp.full((32, 3), 0.7, jnp.float32)
    rgb, sigma = net.apply_network(params, pos, dirs, cfg)
    assert rgb.shape == (32, 3) and sigma.shape == (32,)
    assert np.isfinite(np.asarray(rgb)).all()

    blob = net.pack_params(params, cfg)
    assert blob.size == cfg.n_params
    params2 = net.unpack_params(blob, cfg)
    rgb2, sigma2 = net.apply_network(params2, pos, dirs, cfg)
    # fp16 quantization tolerance
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb2), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma2), atol=2e-2)


def test_density_extraction_is_channel0():
    """sigma must come from the density MLP's channel 0
    (extract_density, nerf_network.cuh:128-134)."""
    cfg = SMALL
    params = net.init_params(jax.random.PRNGKey(1), cfg)
    pos = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (8, 3)), jnp.float32)
    d_out = net.density_raw(params, pos, cfg)
    _, sigma = net.apply_network(params, pos, jnp.full((8, 3), 0.5), cfg)
    np.testing.assert_allclose(np.asarray(d_out[:, 0]), np.asarray(sigma),
                               atol=1e-5)


def test_snapshot_roundtrip(tmp_path):
    from nerf_glasses_tpu.io import snapshot as snap_io
    from nerf_glasses_tpu.io.dataset import NerfDataset, ImageMetadata
    from nerf_glasses_tpu.utils.bbox import BoundingBox

    cfg = NGPConfig()
    params = net.init_params(jax.random.PRNGKey(2), cfg)
    blob = net.pack_params(params, cfg).astype(np.float32)
    grid = np.random.default_rng(0).uniform(
        0, 0.02, (cfg.max_cascade + 1, 128, 128, 128)).astype(np.float32)

    ds = NerfDataset()
    ds.n_images = 2
    ds.xforms = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    ds.metadata = [ImageMetadata(resolution=(800, 800),
                                 focal_length=(1111.0, 1111.0)) for _ in range(2)]
    ds.paths = ["a.png", "b.png"]
    ds.render_aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    ds.aabb_scale = 1

    aabb = BoundingBox([0, 0, 0], [1, 1, 1])
    path = str(tmp_path / "test.msgpack")
    snap_io.save_snapshot(path, cfg, blob, grid, ds, aabb, aabb,
                          np.eye(3, dtype=np.float32), training_step=100,
                          loss=0.001)

    s = snap_io.load_snapshot(path)
    assert s.config.n_levels == cfg.n_levels
    assert s.config.per_level_scale == cfg.per_level_scale or \
        abs(s.config.per_level_scale - cfg.per_level_scale) < 1e-6
    assert s.training_step == 100
    assert s.dataset.n_images == 2
    np.testing.assert_allclose(s.params_blob, blob.astype(np.float16), atol=0)
    np.testing.assert_allclose(s.density_grid, grid.astype(np.float16),
                               atol=1e-6)
    # params reconstruct into a working network
    p2 = net.unpack_params(s.params_blob, s.config)
    pos = jnp.full((4, 3), 0.5)
    rgb, sigma = net.apply_network(p2, pos, pos, s.config)
    assert np.isfinite(np.asarray(rgb)).all()
