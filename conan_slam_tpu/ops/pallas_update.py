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


def rank_update_downdate_reference(p, v, b, w1=None):
    """jnp reference: P + V B V^T - W1 W1^T (W1 optional)."""
    vb = jnp.matmul(v, b, precision=PRECISION)
    out = p + jnp.matmul(vb, v.T, precision=PRECISION)
    if w1 is not None:
        out = out - jnp.matmul(w1, w1.T, precision=PRECISION)
    return out


def rank_update_t_reference(p, vt, b):
    """jnp reference: P + Vt^T B Vt for row-major factor strips Vt (r, D)."""
    return p + jnp.matmul(
        vt.T, jnp.matmul(b, vt, precision=PRECISION), precision=PRECISION
    )


def rank_update_t(p, vt, b, *, interpret: bool = False):
    """Fused P + Vt^T B Vt with the factors given as ROW strips Vt (r, D).

    The fused measurement update produces its factor strips row-major
    (phtT = H P is a row gather of the symmetric P); this entry point
    consumes them directly — no (D, r) concatenation or D-sized transposes.
    vbT = B Vt is one small MXU matmul; each (tr, D) output panel is then
    p_panel + Vt[:, panel]^T vbT with the strips resident in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return rank_update_t_reference(p, vt, b)

    d = p.shape[0]
    vbt = jnp.matmul(b, vt, precision=PRECISION)            # (r, D)
    rm = _round_up(vt.shape[0], 8)
    if rm != vt.shape[0]:
        pad = rm - vt.shape[0]
        vt = jnp.pad(vt, ((0, pad), (0, 0)))
        vbt = jnp.pad(vbt, ((0, pad), (0, 0)))

    cost = pl.CostEstimate(
        flops=2 * d * d * rm,
        bytes_accessed=2 * d * d * 4 + 2 * d * rm * 4,
        transcendentals=0,
    )

    def kernel(p_ref, vt_ref, vbt_ref, out_ref):
        # Panel precision shares the frame kernels' knob (_PANEL_PRECISION,
        # default HIGHEST = fp32 contract — DEFAULT is a measured correctness
        # failure and no bf16x3 tier exists on Mosaic, see frame_kernel.py);
        # the small B Vt prep above always stays HIGHEST.
        from conan_slam_tpu.ops.frame_kernel import panel_dot

        out_ref[:, :] = p_ref[:, :] + panel_dot(
            vt_ref[:, :], vbt_ref[:, :],
            (((0,), (0,)), ((), ())),
        )

    if d % 128 == 0:
        budget = 12 * 2**20
        for tr in (512, 256, 128):
            if d % tr:
                continue
            need = (4 * tr * d + tr * rm + rm * d) * 4
            if need <= budget:
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((d, d), p.dtype),
                    grid=(d // tr,),
                    in_specs=[
                        pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(
                        (tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                    cost_estimate=cost,
                    interpret=interpret,
                )(p, vt, vbt)

    t = _pick_tile(d)
    if t == 0:
        t = 256
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, d), p.dtype),
        grid=(pl.cdiv(d, t), pl.cdiv(d, t)),
        in_specs=[
            pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((rm, t), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rm, t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(p, vt, vbt)


def rank_update_t2_reference(p, vt1, vbt1, vt2, vbt2):
    """jnp reference: P + vt1^T vbt1 + vt2^T vbt2 (row strips (r_i, D))."""
    return (
        p
        + jnp.matmul(vt1.T, vbt1, precision=PRECISION)
        + jnp.matmul(vt2.T, vbt2, precision=PRECISION)
    )
