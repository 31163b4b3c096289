"""Spherical-harmonics direction encoding, degree <= 4.

Coefficients match tiny-cuda-nn's SphericalHarmonicsEncoding
(encodings/spherical_harmonics.h:60-160); input directions are pre-warped
to [0, 1] (warp_direction, testbed.cu:216-218) and unwarped here.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode(dirs01: jnp.ndarray, degree: int = 4, padded_width: int = 16) -> jnp.ndarray:
    """dirs01: (N, 3) directions warped to [0,1] -> (N, padded_width)."""
    return sh_encode_soa(dirs01[..., 0], dirs01[..., 1], dirs01[..., 2],
                         degree, padded_width)


def sh_encode_soa(dx, dy, dz, degree: int = 4,
                  padded_width: int = 16) -> jnp.ndarray:
    """Component-array variant: dx/dy/dz (N,) warped to [0,1]
    -> (N, padded_width). Keeps all math on lane-packed (N,) arrays."""
    x = dx * 2.0 - 1.0
    y = dy * 2.0 - 1.0
    z = dz * 2.0 - 1.0
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2

    one = jnp.ones_like(x)
    out = [one * 0.28209479177387814]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z4 + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4
            + 0.62583573544917614 * y4,
        ]
    feats = jnp.stack(out, axis=-1)
    n = feats.shape[-1]
    if n < padded_width:
        # Padding features are SET TO ONE by tcnn's SH kernel
        # (spherical_harmonics.h:55-61), unlike the grid encoding's zeros.
        pad = jnp.ones(feats.shape[:-1] + (padded_width - n,), feats.dtype)
        feats = jnp.concatenate([feats, pad], axis=-1)
    return feats
