"""SPD matrix inversion as ONE Pallas TPU kernel (the sweep operator).

The fused measurement update needs S^-1 for the innovation covariance
S = H P' H^T + R (2NZ x 2NZ, e.g. 128 x 128 at the benchmark shapes).  XLA's
``cholesky`` + ``triangular_solve`` lower to blocked device loops whose
per-step dispatch overhead dominates at this size (~140 us/frame measured on
v5e — as long as the whole O(D^2) covariance pass).  Here the entire
inversion runs inside a single kernel over a VMEM-resident copy of S: an
in-register ``fori_loop`` of symmetric Gauss-Jordan (sweep) pivots, each a
handful of full-matrix VPU ops, with no per-step XLA dispatch.

Numerics: sweeping an SPD matrix is the standard statistics workhorse for
covariance updates; with the Jacobi pre-scaling applied here (S -> D^-1/2 S
D^-1/2, unit diagonal) its float32 accuracy matches the Cholesky route on
realistic innovation covariances (validated in tests/test_pallas_ops.py).
Non-positive pivots are skipped (guarded reciprocal), preserving the
reference's degrade-don't-crash contract (slam.h:431-434).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from conan_slam_tpu.core.linalg import PRECISION, safe_cholesky, sym


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def sweep_ref_inverse(out_ref, nblk=None):
    """In-place symmetric Gauss-Jordan with 2x2 pivot blocks.

    On entry ``out_ref`` (VMEM, (mp, mp), mp even) holds a (scaled) SPD
    matrix; on exit it holds the inverse.  Reusable from other Pallas
    kernels (ops.frame_kernel embeds it in the fused measurement chain).

    ``nblk`` (static or traced scalar) optionally bounds the sweep to the
    first ``nblk`` pivot blocks; unswept trailing blocks come out as -E
    instead of E^-1 (callers must guarantee they are decoupled and unused —
    see ops.frame_kernel._sweep_si).

    One sweep of pivot block E (rows/cols 2k, 2k+1), C = A[:, blk]:
        A   <- A - C E^-1 C^T          (zeroes the pivot rows/columns)
        A[:, blk] <- C E^-1,  A[blk, :] <- E^-1 C^T,  A[blk, blk] <- -E^-1
    After all m/2 sweeps A = -S^-1.  The matrix stays symmetric throughout,
    so the pivot columns are read as rows (a cheap (2, m) sublane slice) and
    the 2x2 block is extracted with masked lane-reduces — no dynamic lane
    slicing inside the loop.  The accumulator lives in the VMEM out_ref.

    The whole sweep — general downdate, row/column strip overwrite and pivot
    block — is folded into a single rank-2 update with shifted factors:

        A <- A - (c0 - e_a)(u0 - i00 e_a^T - i01 e_b^T)
               - (c1 - e_b)(u1 - i01 e_a^T - i11 e_b^T)
               - 2 (e_a e_a^T + e_b e_b^T)          [a, b = k0, k0+1]

    where u_r = (E^-1 C^T)_r.  Expanding shows every region lands exactly:
    general entries get -C E^-1 C^T, the strips become C E^-1 / E^-1 C^T
    (the e-shifts cancel the strip's own downdate and inject u), the pivot
    off-diagonal comes out -i01 for free, and the pivot diagonal comes out
    2 - i_rr, fixed by the constant -2 diagonal term.  This costs 2 outer
    FMAs + 1 masked add over (mp, mp) per pivot instead of the 8
    full-matrix ops of the region-by-region form — the serial sweep is
    latency-bound on dependent full-matrix VPU ops, so this nearly halves
    its critical path.
    """
    mp = out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)

    def body(k, _):
        k0 = 2 * k
        rows = out_ref[pl.ds(k0, 2), :]                    # (2, mp)
        r0 = rows[0:1, :]
        r1 = rows[1:2, :]
        l0 = lane == k0
        l1 = lane == k0 + 1
        e00 = jnp.sum(jnp.where(l0, r0, 0.0))
        e01 = jnp.sum(jnp.where(l1, r0, 0.0))
        e11 = jnp.sum(jnp.where(l1, r1, 0.0))
        det = e00 * e11 - e01 * e01
        ok = jnp.logical_and(det > 1e-30, e00 > 1e-20)
        idet = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        i00 = e11 * idet
        i01 = -e01 * idet
        i11 = e00 * idet
        # u = E^-1 C^T rows, lane-shifted by the pivot-block inverse.
        g0 = i00 * r0 + i01 * r1 - jnp.where(l0, i00, 0.0) - jnp.where(l1, i01, 0.0)
        g1 = i01 * r0 + i11 * r1 - jnp.where(l0, i01, 0.0) - jnp.where(l1, i11, 0.0)
        ct = jnp.transpose(rows)                           # (mp, 2)
        s0 = sub == k0
        s1 = sub == k0 + 1
        h0 = ct[:, 0:1] - jnp.where(s0, 1.0, 0.0)          # (mp, 1)
        h1 = ct[:, 1:2] - jnp.where(s1, 1.0, 0.0)
        piv = jnp.where(jnp.logical_or(jnp.logical_and(s0, l0),
                                       jnp.logical_and(s1, l1)),
                        jnp.where(ok, 2.0, 0.0), 0.0)      # (mp, mp)
        out_ref[:, :] = out_ref[:, :] - (h0 * g0 + h1 * g1 + piv)
        return 0

    hi = mp // 2 if nblk is None else nblk
    jax.lax.fori_loop(0, hi, body, 0)
    out_ref[:, :] = -out_ref[:, :]


def _sweep_kernel(s_ref, out_ref):
    out_ref[:, :] = s_ref[:, :]
    sweep_ref_inverse(out_ref)


def _sweep_pallas(shat, *, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = shat.shape[0]
    mp = _round_up(m, 128)
    if mp != m:
        # Identity padding: decoupled unit pivots, inverse is identity.
        pad = mp - m
        shat = jnp.pad(shat, ((0, pad), (0, pad)))
        shat = shat.at[m:, m:].set(jnp.eye(pad, dtype=shat.dtype))
    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, mp), shat.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(shat)
    return out[:m, :m]


def spd_inverse(s, *, interpret: bool = False):
    """Inverse of a symmetric positive-definite matrix.

    TPU: Jacobi-scaled sweep in one Pallas kernel.  CPU (tests): Cholesky
    route with the same scaling and the same zero-on-failure guard.
    """
    m = s.shape[0]
    s = sym(s)
    diag = jnp.diagonal(s)
    dsc = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
    shat = s * dsc[:, None] * dsc[None, :]

    if interpret or jax.default_backend() in ("tpu", "axon"):
        si_hat = _sweep_pallas(shat, interpret=interpret)
    else:
        chol = safe_cholesky(shat)
        eye = jnp.eye(m, dtype=s.dtype)
        linv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        si_hat = jnp.matmul(linv.T, linv, precision=PRECISION)

    si = si_hat * dsc[:, None] * dsc[None, :]
    finite = jnp.all(jnp.isfinite(si))
    return jnp.where(finite, sym(si), jnp.zeros_like(si))
