"""Diagnose the compaction quality collapse (r5 A/B: 24.97 dB compact
vs 38.89 dense): compare the density-GRID transmittance-prefix keep
estimate against the EXACT keep computed from the live network, and
both against the static bucket.

Theory under test: the EMA-decayed, sparsely-refreshed grid
UNDERestimates opacity -> keep prefixes run long -> n_keep > bucket ->
perm[:bucket] silently truncates in flat (S-major) order -> every ray
loses its deepest samples -> fog. Runs on CPU (diagnostic, not
timing).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.ops.network import apply_density_activation, density_raw
from nerf_glasses_tpu.train import trainer as T
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer


def main():
    ds = bench_scene.build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast(),
                        compact_keep_fraction=1.0 / 3.0)
    tr = Trainer(ds, opts, seed=3)
    tr.load_snapshot(bench_scene.get_trained_snapshot(
        "/root/repo/assets/cache"))

    S = opts.samples_per_ray
    B = opts.rays_per_batch
    bucket = T.compact_bucket(S * B, opts.compact_keep_fraction)
    print(f"S={S} B={B} dense={S*B} bucket={bucket}", flush=True)

    state = dict(tr.state)
    data = tr.data
    key = jax.random.PRNGKey(7)
    for it in range(4):
        key, r1, r2 = jax.random.split(key, 3)
        img, px, py, target, samples = T._ray_batch(state, data, r1, r2,
                                                    B, opts)

        sel, keep = T.compact_sample_sel(state, data, img, px, py,
                                         samples, opts)
        n_keep_grid = int(jnp.sum(keep))

        # exact keep from the live network
        o0, d0 = T._gen_rays(data, img, px, py,
                             jax.lax.stop_gradient(state["aux"]),
                             opts.apply_lens_distortion)
        pos = o0[None] + d0[None] * samples["t"][..., None]
        extent = state["aabb_max"] - state["aabb_min"]
        pos01 = (pos - state["aabb_min"]) / extent
        raw = density_raw(state["params"], pos01.reshape(-1, 3),
                          opts.config)
        sigma = apply_density_activation(
            raw[:, 0].reshape(S, B), opts.config.density_activation)
        alpha = jnp.where(samples["valid"],
                          1.0 - jnp.exp(-sigma * samples["dt"]), 0.0)
        T_ex = jnp.concatenate(
            [jnp.ones((1, B)), jnp.cumprod(1.0 - alpha, axis=0)[:-1]],
            axis=0)
        keep_x = samples["valid"] & (T_ex > opts.compact_T_eps)
        n_keep_exact = int(jnp.sum(keep_x))
        n_valid = int(jnp.sum(samples["valid"]))

        # what the compacted forward actually evaluates:
        kept_flat = np.zeros((S * B,), bool)
        selv = np.asarray(sel)
        kept_flat[selv] = np.asarray(keep).reshape(-1)[selv]
        exact_flat = np.asarray(keep_x).reshape(-1)
        dropped_true = int((exact_flat & ~kept_flat).sum())
        lost_per_ray = (exact_flat & ~kept_flat).reshape(S, B).any(0)
        print(f"it{it}: valid={n_valid} keep_grid={n_keep_grid} "
              f"keep_exact={n_keep_exact} bucket={bucket} "
              f"overflow={max(0, n_keep_grid - bucket)} "
              f"true_samples_dropped={dropped_true} "
              f"rays_losing_samples={int(lost_per_ray.sum())}/{B}",
              flush=True)


if __name__ == "__main__":
    main()
