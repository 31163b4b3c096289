"""Does samples_per_ray=48 (6.65 steps/s measured, -> 10k steps in ~25
min) hold training quality vs 64 (5.04 steps/s, ~33 min)?

MEASURED (same run, seed 3, 2026-08-18): 48s contract at 544 steps /
122.1 s wall, holdout 38.81 dB; 64s contract at 528 steps / 192.1 s,
holdout 39.05 dB. -0.24 dB for 1.57x faster wall-to-contract -> 48 is
the TrainOptions default.

Trains the bench_scene capture twice to the volume/train.py contract
(loss < 0.00175) + settle, and reports steps-to-contract, wall time,
and holdout PSNR for each. Quality metrics are machine-variance-free
(same seed, same data); only the wall-clock column needs the usual
same-run-interleaved caveat, and ms/step for these configs was already
measured interleaved (tools logs: 153 vs 204 ms/step).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.models.testbed import Testbed
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

SETTLE = 3000


def run(samples: int):
    ds = bench_scene.build_capture_dataset()
    opts = TrainOptions(config=NGPConfig.native_fast(),
                        samples_per_ray=samples)
    tr = Trainer(ds, opts, seed=3)
    t0 = time.perf_counter()
    tr.train_until(0.00175, 4000)
    contract_s = time.perf_counter() - t0
    res = {"samples": samples, "contract_steps": tr.step,
           "contract_s": round(contract_s, 1), "loss": tr.loss}
    if tr.step < SETTLE:
        tr.train(SETTLE - tr.step)
    path = f"/tmp/ab_train_s{samples}.msgpack"
    tr.save_snapshot(path)

    cams, gts = bench_scene.holdout_ground_truth()
    tb = Testbed()
    tb.load_snapshot(path)
    tb.background_color = np.array([1, 1, 1, 1], np.float32)
    outs = []
    for cam in cams:
        tb.camera_matrix = np.asarray(cam, np.float32)
        outs.append(tb.render(bench_scene.W, bench_scene.W,
                              spp=2, linear=False)[..., :3])
    res["holdout_db"] = round(float(np.mean(
        [bench.psnr(a, b) for a, b in zip(outs, gts)])), 2)
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    out = [run(48), run(64)]
    print(json.dumps(out), flush=True)
