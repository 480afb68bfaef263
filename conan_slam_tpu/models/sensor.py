"""Range-bearing sensor model: prediction, Jacobians, feature initialisation.

Reference: ``EKF::observeModel`` (EKF.cpp:354-404), ``PF::computeJacobians``
(PF.cpp:97-132) and the initialisation Jacobians of ``addOneNewFeature``
(EKF.cpp:52-64, PF.cpp:31-38).  The reference builds one sparse 2 x lenX
Eigen matrix per measurement inside loops; here the model returns *dense
batched blocks* — ``(..., 2)`` predictions and ``(..., 2, 3)`` / ``(..., 2, 2)``
Jacobians for all features at once — and the filters assemble whatever larger
operator they need (scattered batch-H for the EKF, per-particle blocks for
the PF) from the same single source of truth.
"""

from __future__ import annotations

import jax.numpy as jnp


def observe(pose, xf):
    """Predicted measurement and Jacobian blocks for features ``xf`` (..., 2).

    Returns:
      zp: (..., 2) predicted (range, bearing) — bearing unwrapped.
      hv: (..., 2, 3) Jacobian wrt vehicle pose.
      hf: (..., 2, 2) Jacobian wrt feature position.
    """
    dx = xf[..., 0] - pose[0]
    dy = xf[..., 1] - pose[1]
    d2 = dx * dx + dy * dy
    # Guard the r=0 singularity (inactive map slots sit at the origin).
    d2 = jnp.maximum(d2, 1e-12)
    d = jnp.sqrt(d2)
    xd, yd = dx / d, dy / d
    xd2, yd2 = dx / d2, dy / d2

    zp = jnp.stack([d, jnp.arctan2(dy, dx) - pose[2]], axis=-1)
    zero = jnp.zeros_like(d)
    one = jnp.ones_like(d)
    hv = jnp.stack(
        [
            jnp.stack([-xd, -yd, zero], axis=-1),
            jnp.stack([yd2, -xd2, -one], axis=-1),
        ],
        axis=-2,
    )
    hf = jnp.stack(
        [
            jnp.stack([xd, yd], axis=-1),
            jnp.stack([-yd2, xd2], axis=-1),
        ],
        axis=-2,
    )
    return zp, hv, hf


def init_feature(pose, z):
    """New-feature position and initialisation Jacobians from measurement(s).

    ``z`` is (..., 2) = (range, bearing).  Returns (xf, gv, gz):
      xf: (..., 2) world position (reference EKF.cpp:47-48).
      gv: (..., 2, 3) d(xf)/d(pose)   (reference EKF.cpp:52-58).
      gz: (..., 2, 2) d(xf)/d(z)      (reference EKF.cpp:60-64).
    """
    r = z[..., 0]
    ang = pose[2] + z[..., 1]
    s, c = jnp.sin(ang), jnp.cos(ang)
    xf = jnp.stack([pose[0] + r * c, pose[1] + r * s], axis=-1)
    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    gv = jnp.stack(
        [
            jnp.stack([one, zero, -r * s], axis=-1),
            jnp.stack([zero, one, r * c], axis=-1),
        ],
        axis=-2,
    )
    gz = jnp.stack(
        [
            jnp.stack([c, -r * s], axis=-1),
            jnp.stack([s, r * c], axis=-1),
        ],
        axis=-2,
    )
    return xf, gv, gz
