"""Attribute the trained-scene flash fidelity gap (r3).

BENCH_r03 rig: holdout flash 33.98 dB vs unbaked 39.05 dB — ~5 dB lost
somewhere between (a) baked-sigma quantization, (b) deferred color,
(c) the flash coarse init / vector rounds, (d) the dropped per-sample
occupancy gate. Renders the trained snapshot's holdout views under one
knob change at a time and reports PSNR vs the exact (unbaked) render AND
vs the mesh-rendered ground truth.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/assets/cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
import bench_scene
from nerf_glasses_tpu.models.testbed import Testbed

FLASH = {}   # the default flash bundle comes from Testbed._march_options


def render_views(tb, cams):
    outs = []
    for cam in cams:
        tb.camera_matrix = np.asarray(cam, np.float32)
        outs.append(tb.render(bench_scene.W, bench_scene.W, spp=2,
                              linear=False)[..., :3])
    return outs


def main():
    snap = bench_scene.get_trained_snapshot(bench.CACHE)
    cams, gts = bench_scene.holdout_ground_truth()
    tb = Testbed()
    tb.load_snapshot(snap)
    tb.background_color = np.array([1.0, 1.0, 1.0, 1.0], np.float32)

    unb = render_views(tb, cams)
    p_unb = float(np.mean([bench.psnr(a, b) for a, b in zip(unb, gts)]))
    print(f"unbaked: vs_gt={p_unb:.2f}", flush=True)

    def probe(label, bake_res=256, flash=True, deferred=None,
              features=True, feat_res=None, sigma_log=True, **ov):
        tb.bake(bake_res, features=features, feat_resolution=feat_res,
                sigma_log=sigma_log)
        tb.flash = flash
        if deferred is not None:
            tb.deferred_shading = deferred
        tb.march_overrides = dict(ov)
        out = render_views(tb, cams)
        tb.flash = False
        tb.deferred_shading = False
        tb.march_overrides = {}
        tb.unbake()
        p_gt = float(np.mean([bench.psnr(a, b) for a, b in zip(out, gts)]))
        p_u = float(np.mean([bench.psnr(a, b) for a, b in zip(out, unb)]))
        print(f"{label}: vs_gt={p_gt:.2f} vs_unbaked={p_u:.2f}", flush=True)

    probes = {
        "baked256": lambda: probe("baked256 (sig color)", flash=False),
        "b256def": lambda: probe("baked256+deferred", flash=False,
                                 deferred=True),
        "flash256": lambda: probe("flash256 (bundle)"),
        "netshade": lambda: probe("flash256 net-shade", features=False),
        "occgate": lambda: probe("flash256+occgate", vector_occ_gate=True),
        "adv48": lambda: probe("flash256+adv48", advance_iters=48),
        "F4": lambda: probe("flash256+F4", lowres_factor=4),
        "spr32": lambda: probe("flash256+spr32", steps_per_round=32),
        "flash384": lambda: probe("flash384", bake_res=384),
        "flash512": lambda: probe("flash512", bake_res=512),
        "flash640": lambda: probe("flash640", bake_res=640),
        "flash768": lambda: probe("flash768", bake_res=768),
        # error decomposition at 512: per-sample color paths isolate the
        # deferred one-eval-per-ray approximation from sigma quantization
        "sigcolor512": lambda: probe("flash512+sigcolor (network/sample)",
                                     bake_res=512, deferred_color=False),
        "featcolor512": lambda: probe("flash512+featcolor (grid/sample)",
                                      bake_res=512, deferred_color=False,
                                      feat_color=True),
        "featcolor768": lambda: probe("flash768+featcolor", bake_res=768,
                                      deferred_color=False,
                                      feat_color=True),
        "feat384": lambda: probe("flash512+feat384", bake_res=512,
                                 feat_res=384),
        "f768feat384": lambda: probe("flash768+feat384", bake_res=768,
                                     feat_res=384),
        "f640feat384": lambda: probe("flash640+feat384", bake_res=640,
                                     feat_res=384),
        # linear vs log-space sigma bake A/B (exp before vs after trilerp)
        "lin512": lambda: probe("flash512 linear-sigma", bake_res=512,
                                sigma_log=False),
        "log512": lambda: probe("flash512 log-sigma", bake_res=512,
                                sigma_log=True),
        "log256": lambda: probe("flash256 log-sigma", sigma_log=True),
        "logbaked512": lambda: probe("baked512 log-sigma sigcolor",
                                     bake_res=512, flash=False,
                                     sigma_log=True),
    }
    names = [a for a in sys.argv[1:] if a in probes] or list(probes)
    for nm in names:
        probes[nm]()


if __name__ == "__main__":
    main()
