"""Turbo / viridis colormaps + depth overlay utilities.

Parity with the reference's render-buffer overlays (colormap_turbo /
colormap_viridis + overlay_depth / overlay_false_color kernels,
src/ngp/render_buffer.cu:421-535) used for depth visualization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def colormap_turbo(x):
    """Polynomial turbo approximation (render_buffer.cu:602-617)."""
    k_r4 = jnp.asarray([0.13572138, 4.61539260, -42.66032258, 132.13108234])
    k_g4 = jnp.asarray([0.09140261, 2.19418839, 4.84296658, -14.18503333])
    k_b4 = jnp.asarray([0.10667330, 12.64194608, -60.58204836, 110.36276771])
    k_r2 = jnp.asarray([-152.94239396, 59.28637943])
    k_g2 = jnp.asarray([4.27729857, 2.82956604])
    k_b2 = jnp.asarray([-89.90310912, 27.34824973])
    x = jnp.clip(x, 0.0, 1.0)
    v4 = jnp.stack([jnp.ones_like(x), x, x * x, x * x * x], -1)
    v2 = jnp.stack([v4[..., 3] * x, v4[..., 3] * v4[..., 2]], -1)
    return jnp.stack([
        v4 @ k_r4 + v2 @ k_r2,
        v4 @ k_g4 + v2 @ k_g2,
        v4 @ k_b4 + v2 @ k_b2,
    ], -1)


_VIRIDIS_ANCHORS = np.array([
    [0.267004, 0.004874, 0.329415],
    [0.282623, 0.140926, 0.457517],
    [0.253935, 0.265254, 0.529983],
    [0.206756, 0.371758, 0.553117],
    [0.163625, 0.471133, 0.558148],
    [0.127568, 0.566949, 0.550556],
    [0.134692, 0.658636, 0.517649],
    [0.266941, 0.748751, 0.440573],
    [0.477504, 0.821444, 0.318195],
    [0.741388, 0.873449, 0.149561],
    [0.993248, 0.906157, 0.143936],
], np.float32)


def colormap_viridis(x):
    x = jnp.clip(x, 0.0, 1.0) * (len(_VIRIDIS_ANCHORS) - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                  len(_VIRIDIS_ANCHORS) - 2)
    f = (x - i0)[..., None]
    table = jnp.asarray(_VIRIDIS_ANCHORS)
    return table[i0] * (1 - f) + table[i0 + 1] * f


def overlay_depth(frame_rgba, depth, alpha: float = 1.0, scale: float = 1.0,
                  colormap: str = "turbo"):
    """Blend a false-color depth visualization over a frame
    (overlay_depth_kernel semantics)."""
    cm = colormap_turbo if colormap == "turbo" else colormap_viridis
    rgb = cm(depth * scale)
    a = jnp.where(depth > 0, alpha, 0.0)[..., None]
    out_rgb = frame_rgba[..., :3] * (1 - a) + rgb * a
    return jnp.concatenate([out_rgb, frame_rgba[..., 3:]], -1)