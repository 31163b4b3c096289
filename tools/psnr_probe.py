import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/assets/cache/jaxcache")
from bench import make_renderer, fidelity_frame, psnr, time_orbit
snap = "/root/repo/assets/cache/bench_head_v2.msgpack"
rU, nU = make_renderer(snap)
ref = np.asarray(fidelity_frame(rU), np.float32)

def probe(label, deferred=False, **ov):
    r2, n2 = make_renderer(snap)
    n2.bake(256)
    n2.deferred_shading = deferred
    n2.march_overrides = ov
    f = np.asarray(fidelity_frame(r2), np.float32)
    fps = time_orbit(r2)
    print(f"{label}: psnr={psnr(f, ref):.2f} fps={fps:.2f}", flush=True)

base = dict(lowres_factor=8, vector_rounds=True, steps_per_round=16)
probe("lv-adv16", advance_iters=16, **base)
probe("lv-adv24", advance_iters=24, **base)
probe("lv-adv8-gate", advance_iters=8, vector_occ_gate=True, **base)
probe("lv-adv16-gate-def", deferred=True, advance_iters=16,
      vector_occ_gate=True, **base)
probe("lv-adv16-def", deferred=True, advance_iters=16, **base)
