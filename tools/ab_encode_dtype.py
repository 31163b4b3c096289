"""On-chip A/B: hash-encode trilinear-sum dtype in TRAINING
(TrainOptions.encode_dtype bf16 vs f32), both with the default
compaction (1/3 keep).

profile_step_split.py attributed ~half of density_fwd to the f32
weighted sum over gathered rows; bf16 is tcnn's native table precision
class. Decision rule: bf16 stays default only if holdout PSNR is
within ~0.1 dB of f32 AND steps/s improves materially.
"""

import dataclasses
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

import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer
from tools.ab_compaction import holdout_db

SETTLE = 3000
TIME_STEPS = 192
ROUNDS = 3


def main():
    ds = bench_scene.build_capture_dataset()
    base = TrainOptions(config=NGPConfig.native_fast())
    variants = {
        "f32": dataclasses.replace(base, encode_dtype="float32"),
        "bf16": dataclasses.replace(base, encode_dtype="bfloat16"),
    }
    trs = {k: Trainer(ds, o, seed=3) for k, o in variants.items()}
    out = {}

    for k, tr in trs.items():
        t0 = time.perf_counter()
        tr.train_until(0.00175, 4000, log_every=0)
        out[f"contract_steps_{k}"] = tr.step
        out[f"contract_s_{k}"] = round(time.perf_counter() - t0, 1)
        tr.train(max(0, SETTLE - tr.step))
        out[f"loss_settle_{k}"] = tr.loss
    print(json.dumps(out), flush=True)

    for tr in trs.values():
        tr.train(64)
    rates = {k: [] for k in trs}
    for _ in range(ROUNDS):
        for k, tr in trs.items():
            t0 = time.perf_counter()
            tr.train(TIME_STEPS)
            rates[k].append(TIME_STEPS / (time.perf_counter() - t0))
    out["steps_per_sec_settled"] = {k: round(max(v), 2)
                                    for k, v in rates.items()}
    out["steps_per_sec_rounds"] = {k: [round(x, 2) for x in v]
                                   for k, v in rates.items()}
    print(json.dumps(out), flush=True)

    for k, tr in trs.items():
        out[f"holdout_db_{k}"] = holdout_db(tr, f"enc_{k}")
        out[f"final_steps_{k}"] = tr.step
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
