"""Measure the fraction of training samples that are valid (occupied-
span) over the course of training — the upper bound on what sample
compaction before the network can save. Runs on CPU with a small batch;
the fraction is batch-size independent."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from pathlib import Path

from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.io.dataset import load_transforms_json
from nerf_glasses_tpu.train import trainer as T

from tests.test_apps import write_disk_dataset

tmp = Path(tempfile.mkdtemp())
write_disk_dataset(tmp)
ds = load_transforms_json(str(tmp))

cfg = NGPConfig.from_snapshot_config({}, ds.aabb_scale, ds.is_hdr)
opts = dataclasses.replace(T.TrainOptions(config=cfg), rays_per_batch=1024)
tr = T.Trainer(ds, opts)


from nerf_glasses_tpu import constants as C
from nerf_glasses_tpu.ops import occupancy as occ_ops


def frac_valid(state):
    rng, r1, r2 = jax.random.split(state["rng"], 3)
    img, px, py, target, samples = T._ray_batch(
        state, tr.data, r1, r2, opts.rays_per_batch, opts)
    v = np.asarray(samples["valid"])
    ray_hit = np.asarray(v.any(axis=0))

    # transmittance-prefix keep mask from the cached density grid: one
    # gather per sample, alpha from the EMA'd optical-thickness field
    o0, d0 = T._gen_rays(tr.data, img, px, py,
                         jax.lax.stop_gradient(state["aux"]),
                         opts.apply_lens_distortion)
    pos = o0[None] + d0[None] * np.asarray(samples["t"])[..., None]
    dt = np.asarray(samples["dt"])
    mip = occ_ops.mip_from_dt(jnp.asarray(dt), jnp.asarray(pos),
                              opts.config.max_cascade)
    g = np.asarray(state["density_grid"])
    mip_scale = np.exp2(-np.asarray(mip, np.float32))
    q = (np.asarray(pos) - 0.5) * mip_scale[..., None] + 0.5
    ci = np.clip(np.trunc(q * C.NERF_GRIDSIZE).astype(np.int64), 0,
                 C.NERF_GRIDSIZE - 1)
    gv = g[np.asarray(mip), ci[..., 2], ci[..., 1], ci[..., 0]]
    sigma = np.maximum(gv, 0.0) / C.MIN_CONE_STEPSIZE
    alpha = np.where(v, 1.0 - np.exp(-sigma * dt), 0.0)
    T_ex = np.concatenate([np.ones((1, alpha.shape[1])),
                           np.cumprod(1.0 - alpha, axis=0)[:-1]], axis=0)
    for eps in (1e-4, 1e-5, 1e-6):
        keep = v & (T_ex > eps)
        print(f"    keep_frac(T>{eps:g}) {keep.mean():.3f}", flush=True)
    return float(v.mean()), float(ray_hit.mean())


for ckpt in [0, 64, 128, 256, 384, 512, 768, 1024]:
    while tr.step < ckpt:
        tr.train(min(64, ckpt - tr.step))
    fv, fr = frac_valid(tr.state)
    print(f"step {tr.step:5d}: loss {tr.loss:.5f} valid_frac {fv:.3f} "
          f"ray_hit_frac {fr:.3f}", flush=True)
