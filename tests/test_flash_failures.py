"""Flash-mode failure-mode regressions (VERDICT r2 weak #2).

Flash's coarse-pass ray init (MarchOptions.lowres_factor) has one known
failure mode: with lowres_cull=True, a NeRF structure thinner than ~2F
pixels that falls between coarse samples is declared empty and
disappears. These tests pin both sides of the tradeoff on synthetic
scenes:

  - a thin slab (a NeRF 'temple arm') renders correctly under the SAFE
    default (lowres_cull=False: the coarse pass only accelerates), and
  - the aggressive cull mode's drop on the same scene is real and
    detected (the regression pin that documents why cull is opt-in).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops import raymarch
from nerf_glasses_tpu.ops.bake import pack_sigma_bricks
from nerf_glasses_tpu.ops.network import init_params

CFG = NGPConfig(n_levels=4, log2_hashmap_size=7, base_resolution=4,
                per_level_scale=2.0)
W = H = 128


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse <= 0 else float(10.0 * np.log10(1.0 / mse))


def _scene_from_mask(mask128, sigma=30.0, occ_pts=True):
    """occupancy + baked sigma from a (128,128,128) [z,y,x] bool mask.
    occ_pts=True additionally attaches the occupied voxel centers, which
    switches flash_init to the voxel-splat path (what Testbed._scene
    produces for baked scenes)."""
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    occ[:] = mask128.astype(np.uint8)[None]
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    # 64^3 baked grid: mark any cell whose 2^3 source block is occupied
    m = mask128.reshape(64, 2, 64, 2, 64, 2).any(axis=(1, 3, 5))
    scene["sigma"] = pack_sigma_bricks(
        np.where(m, sigma, 0.0).astype(np.float32))
    if occ_pts:
        pts = np.argwhere(mask128).astype(np.float32)
        scene["occ_pts"] = jnp.asarray((pts[:, ::-1] + 0.5) / 128.0)
    return scene


def _cam():
    cam = np.zeros((3, 4), np.float32)
    cam[:, 0] = [0.6, 0, 0]
    cam[:, 1] = [0, 0.6, 0]
    cam[:, 2] = [0, 0, -1.0]
    cam[:, 3] = [0.0, 0.0, 1.2]
    return cam


def _opts(**kw):
    return raymarch.MarchOptions(
        config=CFG, jitter=False, compute_dtype="float32",
        use_baked_sigma=True, deferred_color=True, chunk=1024,
        max_rounds=64, **kw)


FLASH = dict(lowres_factor=8, vector_rounds=True, steps_per_round=16,
             advance_iters=24)


def _render(params, scene, opts):
    rgba, _ = raymarch.render_image_device(params, scene, _cam(), W, H,
                                           opts)
    return np.asarray(rgba)


def _thin_slab_mask():
    """A 2-voxel-thick vertical slab — a NeRF 'temple arm' analogue:
    ~2 px on screen, far thinner than the coarse sampling pitch."""
    m = np.zeros((128, 128, 128), bool)
    m[30:98, 30:98, 63:65] = True          # [z, y, x]: thin in x
    return m


def test_flash_splat_init_renders_thin_slab():
    """The voxel-splat coarse init culls conservatively: the thin slab
    survives at full fidelity (its voxels all project into the coarse
    grid, unlike coarse-ray sampling which steps over it)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    scene = _scene_from_mask(_thin_slab_mask())
    exact = _render(params, scene, _opts())
    flash = _render(params, scene, _opts(**FLASH))
    # the slab is visible at all in the exact render
    assert exact[..., 3].max() > 0.5
    p = _psnr(flash, exact)
    assert p > 30.0, p


def test_flash_raywalk_safe_mode_renders_thin_slab():
    """Without occ_pts the ray-walk fallback with lowres_cull=False must
    also keep the slab (un-culled rays start at the aabb entry)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    scene = _scene_from_mask(_thin_slab_mask(), occ_pts=False)
    exact = _render(params, scene, _opts())
    flash_safe = _render(params, scene, _opts(**FLASH, lowres_cull=False))
    p = _psnr(flash_safe, exact)
    assert p > 30.0, p


def test_flash_raywalk_cull_mode_drops_thin_slab():
    """The documented failure mode of the RAY-WALK path with
    lowres_cull=True, pinned: most of the thin slab's coverage
    disappears (this is why baked scenes attach occ_pts and use the
    splat init instead)."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    scene = _scene_from_mask(_thin_slab_mask(), occ_pts=False)
    exact = _render(params, scene, _opts())
    flash_cull = _render(params, scene, _opts(**FLASH, lowres_cull=True))
    cov_exact = float((exact[..., 3] > 0.3).sum())
    cov_cull = float((flash_cull[..., 3] > 0.3).sum())
    assert cov_exact > 100
    assert cov_cull < 0.7 * cov_exact, (cov_cull, cov_exact)


def test_flash_silhouette_grazing_sphere():
    """Silhouette-grazing rays on a bulky object: flash (safe default)
    must hold fidelity at the silhouette, where rays skim the dilated
    baked shell (VERDICT r2 weak #2's second case)."""
    g = (np.arange(128) + 0.5) / 128
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2)
    params = init_params(jax.random.PRNGKey(1), CFG)
    scene = _scene_from_mask(r < 0.28)
    exact = _render(params, scene, _opts())
    flash = _render(params, scene, _opts(**FLASH))
    p = _psnr(flash, exact)
    assert p > 30.0, p
    # the silhouette band specifically (ring where exact coverage
    # transitions): compare alpha there
    a_e = exact[..., 3]
    band = (a_e > 0.05) & (a_e < 0.95)
    if band.sum() > 10:
        d = np.abs(flash[..., 3][band] - a_e[band])
        assert float(d.mean()) < 0.15, float(d.mean())


def test_flash_isolated_floater_splat_init():
    """An isolated 3-voxel floater (the remove_floaties target) between
    coarse samples: the splat init must still render it."""
    m = np.zeros((128, 128, 128), bool)
    m[60:63, 60:63, 60:63] = True
    params = init_params(jax.random.PRNGKey(2), CFG)
    scene = _scene_from_mask(m, sigma=80.0)
    exact = _render(params, scene, _opts())
    flash = _render(params, scene, _opts(**FLASH))
    cov_exact = float((exact[..., 3] > 0.3).sum())
    cov_flash = float((flash[..., 3] > 0.3).sum())
    assert cov_exact >= 1
    assert cov_flash > 0.5 * cov_exact, (cov_flash, cov_exact)
