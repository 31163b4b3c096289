"""Decompose the training step INSIDE one dispatch (r4).

profile_train.py showed the step is linear in rays*samples but never said
which sub-stage dominates. This tool times scan-chained variants that stop
at successive stages of _train_step_body:

  march    : pixel sampling + ray gen + occupancy march (non-diff pass)
  fwd      : march + network forward + composite + loss (no grad)
  grad     : march + value_and_grad (no Adam, no error map)
  full     : the real train_chunk step

Each variant is its own jitted scan over N_STEPS so per-dispatch overhead
amortizes identically; differences isolate stage cost on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

import bench_scene
from nerf_glasses_tpu.config import NGPConfig
from nerf_glasses_tpu.train import trainer as T

N_STEPS = 32


def make_variant(stage, opts):
    def step(state, data):
        rng, r1, r2, r3 = jax.random.split(state["rng"], 4)
        img, px, py, target, samples = T._ray_batch(
            state, data, r1, r2, opts.rays_per_batch, opts)
        state = {**state, "rng": rng, "step": state["step"] + 1}
        if stage == "march":
            return state, jnp.sum(samples["dt"])
        bg = jax.random.uniform(r3, (opts.rays_per_batch, 3))
        if stage == "fwd":
            o, d = T._gen_rays(data, img, px, py, state["aux"],
                               opts.apply_lens_distortion)
            pred, _, _ = T.forward_rays(
                params=state["params"], samples=samples, o=o, d=d, bg=bg,
                opts=opts, aabb_min=state["aabb_min"],
                aabb_max=state["aabb_max"])
            tgt = target[:, :3] + (1.0 - target[:, 3:4]) * bg
            return state, T._loss_fn(pred, tgt, opts)
        (loss, _), (grads, _) = T._loss_and_grads(
            state, data, img, px, py, target, samples, bg, opts)
        if stage == "grad":
            # fold a grad leaf into the output so XLA cannot dead-code
            # the backward pass away
            leaf = jax.tree.leaves(grads)[0]
            return state, loss + 0.0 * jnp.sum(leaf).astype(loss.dtype)
        new_params, new_opt = T.adam_update(state["params"], grads,
                                            state["opt"], state["step"], opts)
        state = {**state, "params": new_params, "opt": new_opt}
        return state, loss

    @partial(jax.jit, donate_argnums=(0,))
    def chunk(state, data):
        return jax.lax.scan(lambda s, _: step(s, data), state, None,
                            length=N_STEPS)

    return chunk


def main():
    ds = bench_scene.build_capture_dataset()
    base = dict(config=NGPConfig.native_fast(), samples_per_ray=48,
                sample_error_map=False, optimize_extrinsics=False)
    extra = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        extra[k] = int(v)
    opts = T.TrainOptions(**{**base, **extra})
    tr = T.Trainer(ds, opts, seed=3)
    tr.train(32)    # settle occ grid etc.
    data, state0 = tr.data, tr.state

    results = {}
    for stage in ["march", "fwd", "grad", "adam"]:
        chunk = make_variant(stage, opts)
        state = jax.tree.map(jnp.copy, state0)
        state, out = chunk(state, data)     # compile
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            state, out = chunk(state, data)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / N_STEPS * 1e3)
        results[stage] = round(best, 1)
        print(f"  {stage:6s} {best:7.2f} ms/step", flush=True)
    # real chunk for reference
    state = jax.tree.map(jnp.copy, state0)
    state, losses = T.train_chunk(state, data, opts, N_STEPS, False, False)
    jax.block_until_ready(losses)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = T.train_chunk(state, data, opts, N_STEPS,
                                      False, False)
        jax.block_until_ready(losses)
        best = min(best, (time.perf_counter() - t0) / N_STEPS * 1e3)
    print(f"  {'real':6s} {best:7.2f} ms/step", flush=True)
    results["real"] = round(best, 1)
    print(results, flush=True)


if __name__ == "__main__":
    main()
