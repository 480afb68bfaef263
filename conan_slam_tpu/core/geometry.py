"""Angle and planar-geometry primitives.

Functional equivalents of the reference's scalar helpers (``pi2Pi``
reference slam.h:816-829, ``signum`` slam.h:924-928, ``computeRangeBearing``
slam.h:339-368), redesigned as batched, jit-safe jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_angle(angle):
    """Wrap angle(s) to [-pi, pi).

    Matches the intent of the reference's ``pi2Pi`` (slam.h:816-829); exact
    behaviour at the +/-pi boundary is not bit-matched (the reference itself is
    asymmetric there).  Works element-wise on arrays of any shape.
    """
    return jnp.remainder(angle + jnp.pi, TWO_PI) - jnp.pi


def range_bearing(pose, points):
    """Range-bearing of ``points`` (..., 2) from vehicle ``pose`` (3,).

    Reference: ``computeRangeBearing`` (slam.h:339-368), which loops per
    landmark; here a single vectorized op over the trailing points axis.

    Returns (range, bearing) each shaped like ``points[..., 0]``.  Bearing is
    *not* wrapped, matching the reference (it feeds innovations that are
    wrapped at the point of use).
    """
    d = points - pose[:2]
    rng = jnp.sqrt(jnp.sum(d * d, axis=-1))
    brg = jnp.arctan2(d[..., 1], d[..., 0]) - pose[2]
    return rng, brg


def landmark_from_range_bearing(pose, z):
    """Inverse sensor model: world position of a range-bearing return.

    Reference: feature initialisation in ``addOneNewFeature``
    (EKF.cpp:44-49, PF.cpp:23-29): ``x + r*cos(phi+b), y + r*sin(phi+b)``.
    ``z`` is (..., 2) = (range, bearing); returns (..., 2) positions.
    """
    ang = pose[2] + z[..., 1]
    return jnp.stack(
        [pose[0] + z[..., 0] * jnp.cos(ang), pose[1] + z[..., 0] * jnp.sin(ang)],
        axis=-1,
    )
