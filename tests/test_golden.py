"""Image-level regression: fixed camera -> PSNR against a stored golden
(SURVEY.md §4 test layer 4; reference goldens are LFS-stripped so goldens
are pinned from this renderer's first validated build)."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "sphere_trained_48.npy")


def _render_current():
    from nerf_glasses_tpu.utils.camera import pack_camera
    from tests.test_training import (TINY_OPTS, Trainer, make_synth_dataset,
                                     synth_camera)
    tr = Trainer(make_synth_dataset(), TINY_OPTS, seed=1337)
    tr.occ_warmup_steps = 64
    tr.train(300)
    tb = tr.to_testbed()
    m = synth_camera(0.0)
    tb.camera_matrix = pack_camera(m[:, 0], -m[:, 1], m[:, 2],
                                   m[:, 3] - 0.5, aspect=1.0)
    tb.march_overrides = {"jitter": False, "max_rounds": 256}
    return tb.render(48, 48, spp=1, linear=False)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.slow
def test_trained_render_matches_golden():
    img = _render_current()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, img.astype(np.float16))
        pytest.skip("golden generated; commit tests/goldens and re-run")
    golden = np.load(GOLDEN).astype(np.float32)
    p = psnr(img[..., :3], golden[..., :3])
    # tolerant: training is seeded but float details may drift across
    # jax/XLA versions; structural regressions drop PSNR far below this
    assert p > 25.0, f"PSNR vs golden: {p:.2f} dB"
