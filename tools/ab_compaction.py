"""On-chip A/B: transmittance-prefix sample compaction (r4's lever,
TrainOptions.compact_keep_fraction) vs dense training.

Measures, in ONE run (same seed, interleaved timing rounds so the
machine's 1.5-2x drift cancels):
  - the volume/train.py contract (loss < 0.00175): steps + wall;
  - steps/s dense vs compacted, measured at the SETTLED grid (the
    adaptive occupied-fraction gate keeps compaction off while the grid
    is foggy — see TrainOptions.compact_occ_frac_gate for the measured
    20 dB failure when it engages too early);
  - the step at which the adaptive gate opened;
  - holdout PSNR at settle (3000 steps) for each — the quality budget
    the compaction default must not spend.

Decision rule (VERDICT r4 #3): compaction defaults ON only if holdout
PSNR is within ~0.1 dB of dense AND steps/s improves materially.
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

import dataclasses

import bench
import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.models.testbed import Testbed
from nerf_glasses_tpu.train.trainer import TrainOptions, Trainer

SETTLE = 3000
TIME_STEPS = 192
ROUNDS = 3


def holdout_db(tr, tag):
    path = f"/tmp/ab_compact_{tag}.msgpack"
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
    return round(float(np.mean(
        [bench.psnr(a, b) for a, b in zip(outs, gts)])), 2)


def main():
    keep = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0 / 3.0
    ds = bench_scene.build_capture_dataset()
    base = TrainOptions(config=NGPConfig.native_fast())
    variants = {
        "dense": dataclasses.replace(base, compact_keep_fraction=0.0),
        "compact": dataclasses.replace(base, compact_keep_fraction=keep),
    }
    trs = {k: Trainer(ds, o, seed=3) for k, o in variants.items()}
    out = {"keep_fraction": keep}

    # contract + settle, tracking when the adaptive gate opens
    gate_step = None
    for k, tr in trs.items():
        t0 = time.perf_counter()
        tr.train_until(0.00175, 4000, log_every=0)
        out[f"contract_steps_{k}"] = tr.step
        out[f"contract_s_{k}"] = round(time.perf_counter() - t0, 1)
        while tr.step < SETTLE:
            tr.train(min(256, SETTLE - tr.step))
            if (k == "compact" and gate_step is None
                    and tr._compact_ready):
                gate_step = tr.step
        out[f"loss_settle_{k}"] = tr.loss
    out["compact_gate_opened_by_step"] = gate_step
    print(json.dumps(out), flush=True)

    # interleaved steps/s at the settled grid (gate open)
    for tr in trs.values():
        tr.train(64)                  # compile the post-gate variant
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
    out["compact_active_at_timing"] = trs["compact"]._compact_ready
    print(json.dumps(out), flush=True)

    # quality at (slightly past) settle
    for k, tr in trs.items():
        out[f"holdout_db_{k}"] = holdout_db(tr, k)
        out[f"final_steps_{k}"] = tr.step
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
