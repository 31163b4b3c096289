"""A/B the Pallas advance kernel vs the XLA advance pass on the real
TPU, interleaved in one run (end-to-end 720p flash frame on the bench
blob, NeRF-only), plus a PSNR check that the two paths render the same
image.
"""

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

REPS = 6

VARIANTS = [
    ("xla advance", {}),
    ("pallas advance", {"pallas_advance": True}),
    ("pallas flash", {"pallas_flash": True}),
    ("pallas flash e2", {"pallas_flash": True, "pallas_flash_epochs": 2}),
    ("pallas flash e4", {"pallas_flash": True, "pallas_flash_epochs": 4}),
]


def main():
    snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
    if not os.path.exists(snap):
        bench.build_bench_snapshot(snap)
    renderer, nerf = bench.make_renderer(snap, load_glasses=False)
    nerf.bake(256)
    nerf.flash = True
    w, h = renderer.render_width, renderer.render_height

    def run():
        fb, db = nerf.render_frame_buffers(w, h)
        run.out = fb

    def drain():
        return float(run.out[0, 0, 3])

    import traceback
    frames = {}
    ok_variants = []
    for name, kw in VARIANTS:
        nerf.march_overrides = dict(kw)
        t0 = time.perf_counter()
        try:
            run()
            drain()
        except Exception:
            print(f"VARIANT FAILED: {name}", flush=True)
            traceback.print_exc()
            continue
        frames[name] = np.asarray(run.out)
        ok_variants.append((name, kw))
        print(f"compiled {name:16s} ({time.perf_counter() - t0:.0f} s)",
              flush=True)
    ref_frame = frames[ok_variants[0][0]]
    for name, _ in ok_variants[1:]:
        mse = float(np.mean((frames[name][..., :3]
                             - ref_frame[..., :3]) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        print(f"{name} vs xla frame PSNR: {psnr:.2f} dB", flush=True)

    results = {}
    for rnd in range(4):
        for name, kw in ok_variants:
            nerf.march_overrides = dict(kw)
            run()
            drain()
            t0 = time.perf_counter()
            for _ in range(REPS):
                run()
            drain()
            dt = (time.perf_counter() - t0) / REPS * 1000.0
            print(f"[r{rnd}] {name:16s} {dt:8.2f} ms", flush=True)
            results.setdefault(name, []).append(dt)
    print({k: round(min(v), 1) for k, v in results.items()}, flush=True)

    # ---- standalone slope probe: per-iteration cost of each advance
    # implementation (iters 24 vs 240 on one 2048-ray chunk; the slope
    # calibrates Mosaic's in-kernel gather rate for bigger fusions) ----
    import jax.numpy as jnp
    import numpy as np
    from nerf_glasses_tpu import constants as C
    from nerf_glasses_tpu.config import NGPConfig
    from nerf_glasses_tpu.ops import raymarch
    from nerf_glasses_tpu.ops import advance_pallas as ap

    rng = np.random.default_rng(0)
    occ = np.zeros((8, 128, 128, 128), np.uint8)
    occ[0, 40:90, 40:90, 40:90] = rng.uniform(size=(50,) * 3) < 0.02
    scene = raymarch.make_scene(occ, np.zeros(3), np.ones(3), np.eye(3),
                                np.zeros(3), np.ones(3))
    o = rng.uniform(0.05, 0.95, size=(ap.BLOCK, 3)).astype(np.float32)
    dvec = rng.normal(size=(ap.BLOCK, 3)).astype(np.float32)
    dvec /= np.linalg.norm(dvec, axis=1, keepdims=True)
    st = {"o": jnp.asarray(o), "d": jnp.asarray(dvec),
          "t": jnp.zeros(ap.BLOCK), "t_surf": jnp.zeros(ap.BLOCK),
          "surf_a": jnp.zeros(ap.BLOCK), "t_start": jnp.zeros(ap.BLOCK),
          "alive": jnp.ones(ap.BLOCK, bool)}
    opts = raymarch.MarchOptions(config=NGPConfig(), cone_angle=0.0,
                                 jitter=False)
    t_exit = raymarch._ray_exit_t(st["o"], st["d"], scene)
    dt_c = float(C.MIN_CONE_STEPSIZE)

    import functools
    xla_fn = jax.jit(functools.partial(raymarch._advance_pass, opts=opts),
                     static_argnames=("iters",))

    def time_leg(fn, iters, reps=50):
        out = fn(iters)
        _ = float(out["t"][0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(iters)
        _ = float(out["t"][0])
        return (time.perf_counter() - t0) / reps * 1e3

    legs = {
        "xla": lambda it: xla_fn(dict(st), scene, iters=it),
        "pallas": lambda it: ap.advance_pass_pallas(dict(st), scene, it,
                                                    dt_c, t_exit),
    }
    for rnd in range(2):
        for nm, fn in legs.items():
            lo, hi = time_leg(fn, 24), time_leg(fn, 240)
            print(f"[slope r{rnd}] {nm:7s} 24it {lo:7.3f} ms  "
                  f"240it {hi:7.3f} ms  -> {(hi - lo) / 216 * 1e3:6.1f} "
                  f"us/iter", flush=True)

    # ---- standalone epoch probe: fused kernel vs XLA advance+round on
    # one chunk (the per-chunk cost the 720p frame pays ~450x) ----
    from nerf_glasses_tpu.ops import flash_pallas as fp
    from nerf_glasses_tpu.ops.bake import pack_sigma_bricks

    base = rng.uniform(0.0, 30.0, size=(16, 16, 16)).astype(np.float32)
    grid = np.repeat(np.repeat(np.repeat(base, 8, 0), 8, 1), 8, 2)
    grid *= np.asarray(occ[0], np.float32)
    scene["sigma"] = pack_sigma_bricks(grid)
    scene["sigma_lin"] = jnp.asarray(grid.reshape(-1, 128))
    st2 = dict(st, surf=jnp.zeros((fp.BLOCK, 4)),
               rgba=jnp.zeros((fp.BLOCK, 4)), depth=jnp.zeros(fp.BLOCK),
               max_weight=jnp.zeros(fp.BLOCK), wn=jnp.zeros(fp.BLOCK))

    def epoch_opts(e):
        return raymarch.MarchOptions(
            config=NGPConfig(), cone_angle=0.0, jitter=False,
            use_baked_sigma=True, deferred_color=True, vector_rounds=True,
            steps_per_round=16, advance_iters=24, chunk=fp.BLOCK,
            vector_occ_gate=False, pallas_flash_epochs=e)

    def xla_epoch(s, sc, o_):
        sub = raymarch._advance_pass(dict(s), sc, o_, o_.advance_iters)
        return raymarch._march_round(sub, params_dummy, sc, o_)

    from nerf_glasses_tpu.ops.network import init_params
    params_dummy = init_params(jax.random.PRNGKey(0), NGPConfig(
        n_levels=2, log2_hashmap_size=8, base_resolution=4))
    o1 = epoch_opts(1)
    xla_jit = jax.jit(lambda s, sc: xla_epoch(s, sc, o1))

    epoch_legs = {
        "xla epoch": lambda: xla_jit(st2, scene),
        "kernel e1": lambda: fp.flash_epoch_pass(dict(st2), scene, o1),
        "kernel e4": lambda: fp.flash_epoch_pass(dict(st2), scene,
                                                 epoch_opts(4)),
    }

    def time_epoch(fn, reps=50):
        out = fn()
        _ = float(out["t"][0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = float(out["t"][0])
        return (time.perf_counter() - t0) / reps * 1e3

    for rnd in range(2):
        for nm, fn in epoch_legs.items():
            try:
                print(f"[epoch r{rnd}] {nm:10s} {time_epoch(fn):7.3f} ms",
                      flush=True)
            except Exception:
                print(f"EPOCH LEG FAILED: {nm}", flush=True)
                traceback.print_exc()


if __name__ == "__main__":
    main()
