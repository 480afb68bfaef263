"""Pallas TPU kernels for the covariance hot path.

BASELINE.json north star: "the EKF predict/update loop ... becomes dense
Pallas kernels over an HBM-resident state/covariance matrix".  The dominant
HBM traffic is the O(D^2) read-modify-write of the joint covariance; the
fastframe compounding (filters.ekf.fastframe) plus the Cholesky-form
measurement update reduce a whole observation frame to

    P <- P + V B V^T - W1 W1^T

one symmetric rank-(r + 2m) correction.  The kernel below applies it in a
single tiled pass over P: each (T x T) tile is read once, updated with two
MXU matmuls against the (D x r)/(D x 2m) factor strips, and written once —
speed-of-light = one P read + one P write per frame.

The jnp fallback (used on CPU and for verification) is numerically identical
modulo float32 reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from conan_slam_tpu.core.linalg import PRECISION


def _pick_tile(d: int) -> int:
    for t in (512, 256, 128):
        if d % t == 0:
            return t
    return 0


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def rank_update_downdate_reference(p, v, b, w1):
    """jnp reference: P + V B V^T - W1 W1^T."""
    vb = jnp.matmul(v, b, precision=PRECISION)
    return (
        p
        + jnp.matmul(vb, v.T, precision=PRECISION)
        - jnp.matmul(w1, w1.T, precision=PRECISION)
    )


def rank_update_downdate(p, v, b, w1, *, interpret: bool = False):
    """Fused P + V B V^T - W1 W1^T on TPU via Pallas.

    Args:
      p: (D, D) covariance (D must be a multiple of 128; callers pad).
      v: (D, r) rank-update factors.
      b: (r, r) small symmetric middle matrix.
      w1: (D, m) whitened Kalman gain strip (downdate factors).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Pallas TPU lowering only; CPU (tests) uses the jnp reference unless
    # explicitly interpreting.
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return rank_update_downdate_reference(p, v, b, w1)

    d = p.shape[0]
    t = _pick_tile(d)
    if t == 0:
        # State dims are 3 + 2K (odd): partial boundary tiles are safe for
        # this kernel (garbage reads only land in out-of-range rows/columns,
        # which stores drop), so use a cdiv grid — provided the *factor*
        # minor dims are lane/sublane aligned, which we pad ourselves.
        t = 256

    vb = jnp.matmul(v, b, precision=PRECISION)              # (D, r)
    r = _round_up(v.shape[1], 8)
    m = _round_up(w1.shape[1], 8)
    if r != v.shape[1]:
        pad = r - v.shape[1]
        v = jnp.pad(v, ((0, 0), (0, pad)))
        vb = jnp.pad(vb, ((0, 0), (0, pad)))
    if m != w1.shape[1]:
        w1 = jnp.pad(w1, ((0, 0), (0, m - w1.shape[1])))
    grid = (pl.cdiv(d, t), pl.cdiv(d, t))

    def kernel(p_ref, vb_ref, vt_ref, w1_ref, w1t_ref, out_ref):
        out_ref[:, :] = (
            p_ref[:, :]
            + jnp.dot(vb_ref[:, :], vt_ref[:, :], preferred_element_type=jnp.float32)
            - jnp.dot(w1_ref[:, :], w1t_ref[:, :], preferred_element_type=jnp.float32)
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, d), p.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, r), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * d * d * (r + m),
            bytes_accessed=2 * d * d * 4 + 2 * d * (r + m) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(p, vb, v.T, w1, w1.T)
