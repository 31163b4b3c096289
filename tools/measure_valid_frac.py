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


def frac_valid(state):
    rng, r1, r2 = jax.random.split(state["rng"], 3)
    img, px, py, target, samples = T._ray_batch(
        state, tr.data, r1, r2, opts.rays_per_batch, opts)
    v = np.asarray(samples["valid"])
    ray_hit = np.asarray(v.any(axis=0))
    return float(v.mean()), float(ray_hit.mean())


for ckpt in [0, 64, 128, 256, 384, 512, 768, 1024]:
    while tr.step < ckpt:
        tr.train(min(64, ckpt - tr.step))
    fv, fr = frac_valid(tr.state)
    print(f"step {tr.step:5d}: loss {tr.loss:.5f} valid_frac {fv:.3f} "
          f"ray_hit_frac {fr:.3f}", flush=True)
