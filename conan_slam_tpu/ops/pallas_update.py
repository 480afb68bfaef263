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


def rank_update_t(p, vt, b, *, interpret: bool = False,
                  mode: str | None = None):
    """Fused P + Vt^T B Vt with the factors given as ROW strips Vt (r, D).

    The fused measurement update produces its factor strips row-major
    (phtT = H P is a row gather of the symmetric P); this entry point
    consumes them directly — no (D, r) concatenation or D-sized transposes.
    vbT = B Vt is one small MXU matmul; each (tr, D) output panel is then
    p_panel + Vt[:, panel]^T vbT with the strips resident in VMEM.

    ``mode`` overrides the panel-precision tier for THIS call (None follows
    FK_PANEL_PRECISION_SAFE, the gated-path default).  Only pass a fast
    split tier from consumers a long-horizon gate has validated — see the
    precision policy in ops.frame_kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return rank_update_t_reference(p, vt, b)

    from conan_slam_tpu.ops.frame_kernel import (
        _SAFE_MODE,
        panel_dot,
        split_hi_lo,
        split_hml,
    )

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

    # Panel precision: the KNOWN-association frame kernel defaults to the
    # split3 product tier, but THIS kernel sits on the gated path and so
    # follows FK_PANEL_PRECISION_SAFE (default HIGHEST / fp32 contract) per
    # the gated-path precision policy — see frame_kernel.py:_SAFE_MODE for
    # the measured association-corruption failure that forced it.  The small
    # B Vt prep above always stays HIGHEST.  Under the split tier the hi/lo
    # decomposition happens ONCE here (XLA level) and the kernel consumes
    # four bf16 strips — no per-panel conversion of loop-invariant operands,
    # and half the strip DMA.
    split_mode = _SAFE_MODE if mode is None else mode
    split = split_mode in ("split3", "split4", "hi6")
    if split:
        # K-STACKED split product (measured -13.5 us/pass at rank 288,
        # D=2304 vs the multi-dot form): the cross terms ride ONE matmul's
        # K dimension — [ah; ah; al] x [bh; bl; bh] for split3 (+ [al]/[bl]
        # for split4) — so the MXU accumulates them internally and the
        # per-panel f32 temps + VPU adds of the 3-dot form disappear.
        # "hi6" is the fp32-ACCURATE member: 3-way bf16 operands (24
        # mantissa bits) with the 6 cross terms >= 2^-24 stacked — ~0.75x
        # the HIGHEST tier's cost with float32-level error, for consumers
        # (the gated path) where 16-bit splits are arithmetically excluded
        # (see split_hml).
        if split_mode == "hi6":
            a_h, a_m, a_l = split_hml(vt)
            b_h, b_m, b_l = split_hml(vbt)
            vt_s = jnp.concatenate([a_h, a_h, a_m, a_h, a_l, a_m], axis=0)
            vbt_s = jnp.concatenate([b_h, b_m, b_h, b_l, b_h, b_m], axis=0)
        else:
            vt_h, vt_l = split_hi_lo(vt)
            vbt_h, vbt_l = split_hi_lo(vbt)
            if split_mode == "split3":
                vt_s = jnp.concatenate([vt_h, vt_h, vt_l], axis=0)
                vbt_s = jnp.concatenate([vbt_h, vbt_l, vbt_h], axis=0)
            else:
                vt_s = jnp.concatenate([vt_h, vt_h, vt_l, vt_l], axis=0)
                vbt_s = jnp.concatenate(
                    [vbt_h, vbt_l, vbt_h, vbt_l], axis=0
                )
        strips = (vt_s, vbt_s)
        km = vt_s.shape[0]

        def kernel(p_ref, vts_ref, vbts_ref, out_ref):
            out_ref[:, :] = p_ref[:, :] + jax.lax.dot_general(
                vts_ref[:, :], vbts_ref[:, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
    else:
        strips = (vt, vbt)
        km = rm

        def kernel(p_ref, vt_ref, vbt_ref, out_ref):
            out_ref[:, :] = p_ref[:, :] + panel_dot(
                vt_ref[:, :], vbt_ref[:, :],
                (((0,), (0,)), ((), ())), mode=mode,
            )

    sbytes = 2 if split else 4

    def strip_specs(row_blk, col_blk, row_map, col_map):
        row_spec = pl.BlockSpec((km, row_blk), row_map, memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((km, col_blk), col_map, memory_space=pltpu.VMEM)
        return [row_spec, col_spec]

    if d % 128 == 0:
        budget = 12 * 2**20
        for tr in (512, 256, 128):
            if d % tr:
                continue
            need = (4 * tr * d) * 4 + (tr + d) * km * sbytes
            if need <= budget:
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((d, d), p.dtype),
                    grid=(d // tr,),
                    in_specs=[
                        pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    ] + strip_specs(tr, d, lambda i: (0, i), lambda i: (0, 0)),
                    out_specs=pl.BlockSpec(
                        (tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                    cost_estimate=cost,
                    interpret=interpret,
                )(p, *strips)

    # Big-D 2-D schedule: row panels x WIDE column blocks (cdiv grid, ragged
    # edges masked by Pallas).  The old square (256, 256) tiling ran 6,241
    # grid steps at D=20224 with the (rm, 256) strip blocks re-fetched per
    # tile — per-step overhead dominated (measured 13.0 ms/frame vs the
    # ~2.2 ms one-read-one-write HBM floor of the 1.64 GB covariance).
    # Wide blocks cut the step count ~8x and the strip re-reads with it.
    t = 256
    budget = 12 * 2**20
    tc = 256
    for cand in (4096, 2048, 1024, 512, 256):
        if 4 * t * cand * 4 + km * (t + cand) * sbytes <= budget:
            tc = cand
            break
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, d), p.dtype),
        grid=(pl.cdiv(d, t), pl.cdiv(d, tc)),
        in_specs=[
            pl.BlockSpec((t, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ] + strip_specs(t, tc, lambda i, j: (0, i), lambda i, j: (0, j)),
        out_specs=pl.BlockSpec((t, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret,
    )(p, *strips)


def rank_update_t2_reference(p, vt1, vbt1, vt2, vbt2):
    """jnp reference: P + vt1^T vbt1 + vt2^T vbt2 (row strips (r_i, D))."""
    return (
        p
        + jnp.matmul(vt1.T, vbt1, precision=PRECISION)
        + jnp.matmul(vt2.T, vbt2, precision=PRECISION)
    )
