"""RGB spectrum helpers.

Reference: /root/reference/src/core/spectrum.{h,cpp} — the framework uses the
reference's default compile-time choice ``RGBSpectrum`` (pbrt.h:110-111), i.e.
3-channel float.  ``y()`` luminance weights match RGBSpectrum::y
(spectrum.h:495-499); RGB<->XYZ matrices match spectrum.h:181-201.

TPU-first design: a Spectrum is any ``(..., 3)`` float32 array, channel axis
last so it rides the VPU lane dimension.  No class, no dynamic nSamples.
"""

from __future__ import annotations

import jax.numpy as jnp

N_SPECTRUM_SAMPLES = 3  # RGBSpectrum

_Y_WEIGHT = jnp.array([0.212671, 0.715160, 0.072169], jnp.float32)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGBSpectrum::y() (spectrum.h:495-499)."""
    return jnp.sum(rgb * _Y_WEIGHT, axis=-1)


def is_black(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(rgb == 0.0, axis=-1)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """spectrum.h:192-201 RGBToXYZ."""
    m = jnp.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        jnp.float32,
    )
    return rgb @ m.T


def xyz_to_rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    """spectrum.h:181-190 XYZToRGB."""
    m = jnp.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875991, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        jnp.float32,
    )
    return xyz @ m.T
