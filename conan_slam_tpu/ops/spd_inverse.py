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
    """
    mp = out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)

    def body(k, _):
        k0 = 2 * k
        rows = out_ref[pl.ds(k0, 2), :]                    # (2, mp)
        r0 = rows[0:1, :]
        r1 = rows[1:2, :]
        e00 = jnp.sum(jnp.where(lane == k0, r0, 0.0))
        e01 = jnp.sum(jnp.where(lane == k0 + 1, r0, 0.0))
        e11 = jnp.sum(jnp.where(lane == k0 + 1, r1, 0.0))
        det = e00 * e11 - e01 * e01
        ok = jnp.logical_and(det > 1e-30, e00 > 1e-20)
        idet = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        i00 = e11 * idet
        i01 = -e01 * idet
        i11 = e00 * idet
        # u = E^-1 C^T: the swept row strip.
        u0 = i00 * r0 + i01 * r1                           # (1, mp)
        u1 = i01 * r0 + i11 * r1
        c0 = jnp.transpose(r0)                             # (mp, 1)
        c1 = jnp.transpose(r1)
        a = out_ref[:, :]
        a = a - (c0 * u0 + c1 * u1)                        # A - C E^-1 C^T
        # Column strip C E^-1 written back via lane masks; row strip via
        # sublane masks; both give exactly I at the pivot block (C[blk] = E).
        a = a + jnp.where(j2 == k0, c0 * i00 + c1 * i01, 0.0)
        a = a + jnp.where(j2 == k0 + 1, c0 * i01 + c1 * i11, 0.0)
        a = a + jnp.where(i2 == k0, u0, 0.0)
        a = a + jnp.where(i2 == k0 + 1, u1, 0.0)
        # Pivot block now holds I + I = 2I (when swept); set it to -E^-1.
        pb = jnp.logical_and(i2 >= k0, i2 < k0 + 2)
        pb = jnp.logical_and(pb, jnp.logical_and(j2 >= k0, j2 < k0 + 2))
        diag = jnp.logical_and(pb, i2 == j2)
        offd = jnp.logical_and(pb, i2 != j2)
        ii = jnp.where(i2 == k0, jnp.where(j2 == k0, i00, i01),
                       jnp.where(j2 == k0, i01, i11))
        fix = jnp.where(diag, -ii - 2.0, jnp.where(offd, -ii, 0.0))
        a = a + jnp.where(ok, jnp.where(pb, fix, 0.0), 0.0)
        out_ref[:, :] = a
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
