"""ONE-dispatch Pallas measurement chain for the fused EKF frame update.

The gather-based measurement operator (filters.ekf.update.fused_frame_update)
is algebraically cheap — a few hundred MFLOPs against row strips of P — but as
~20 separate XLA ops (strip matmuls, lane gathers, block-diagonal scatters,
the S^-1 sweep, gain matvecs) it pays per-op dispatch/latency that dominates
the frame at benchmark scale (~215 us/frame measured on v5e vs ~60 us of
actual compute).  This kernel runs the whole chain in a single Pallas program
over VMEM-resident strips:

    phtT   = Hc Prows + (Hc Vrows) B Vt            (P' H^T row strips)
    S      = phtT E Hc^T + R                       (E = one-hot column gather)
    S^-1   = Jacobi-scaled symmetric sweep         (ops.spd_inverse loop)
    siv    = v S^-1;  dx = siv phtT;  nis = siv . v
    -S^-1 phtT and B Vt                            (rank-update strips for
                                                    ops.pallas_update.rank_update_t2)

where Hc is the (2NZ, 3+2NZ) *compact* H (pose block + per-measurement 2x2
feature blocks) and Prows the (3+2NZ, D) gathered rows of P — H only ever
touches those rows/columns (reference EKF.cpp:354-404 builds the same sparse
structure per measurement).  The only O(D^2) work of the frame stays in the
separate tiled rank-update pass over P.

Masked measurements carry zero Hc rows, zero innovation and identity R
blocks, so they decouple exactly (the sweep inverts their identity block to
identity and their gains vanish) — same semantics as the multi-op path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conan_slam_tpu.core.linalg import PRECISION
from conan_slam_tpu.ops.spd_inverse import sweep_ref_inverse


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class MeasurementChain(NamedTuple):
    """Outputs of the fused chain (padded shapes; see ``measurement_chain``)."""

    pht: jax.Array      # (MP, D)  P' H^T row strips (zero on padded rows)
    bvt: jax.Array      # (NBP, D) B V^T rank-update strip
    nsipht: jax.Array   # (MP, D)  -S^-1 phtT downdate strip
    siv: jax.Array      # (MP,)    S^-1 v stacked gains
    dx: jax.Array       # (D,)     state-mean correction phtT^T S^-1 v
    nis: jax.Array      # ()       v^T S^-1 v (stacked NIS)


def _chain_core(rows_ref, hc_ref, prows_ref, bmat_ref, vtf_ref,
                rmat_ref, v_ref, s_scr):
    """Shared chain math (see module docstring); returns value tuple
    ``(pht, si, siv)`` with shapes (MP, D), (MP, MP), (1, MP)."""
    f32 = jnp.float32
    d = prows_ref.shape[1]
    rp = rows_ref.shape[1]

    # One-hot row selector E[d, c] = (d == rows[c]); padded slots carry
    # rows = -1 and select nothing.  Used for both the frame-factor row
    # gather (Vrows = Vt E) and the S column gather below.
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (d, rp), 0) == rows_ref[:, :]
    ).astype(f32)

    # P' H^T row strips: compact H against the gathered rows of P, plus the
    # factored frame correction (Hc Vrows) B Vt.
    vrows_t = jax.lax.dot_general(
        vtf_ref[:, :], e,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                       # (NBP, RP)
    hvm = jax.lax.dot_general(
        hc_ref[:, :], vrows_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )                                                       # (MP, NBP)
    hvb = jax.lax.dot_general(
        hvm, bmat_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    pht = jax.lax.dot_general(
        hc_ref[:, :], prows_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(
        hvb, vtf_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    # S = phtT[:, rows] Hc^T + R.
    psub = jax.lax.dot_general(
        pht, e, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                       # (MP, RP)
    s = jax.lax.dot_general(
        psub, hc_ref[:, :], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) + rmat_ref[:, :]

    # Jacobi scaling (unit diagonal) then the in-register symmetric sweep.
    mp = s.shape[0]
    i2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    diag = jnp.sum(jnp.where(i2 == j2, s, 0.0), axis=1, keepdims=True)
    dsc = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))           # (MP, 1)
    dsc_row = jnp.transpose(dsc)                            # (1, MP)
    s_scr[:, :] = s * dsc * dsc_row
    sweep_ref_inverse(s_scr)
    si = s_scr[:, :] * dsc * dsc_row
    finite = jnp.all(jnp.isfinite(si))
    si = jnp.where(finite, si, 0.0)

    siv = jax.lax.dot_general(
        v_ref[:, :], si, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                       # (1, MP)
    return pht, si, siv


def _mega_kernel(rows_ref, hc_ref, prows_ref, bmat_ref, vtf_ref,
                 rmat_ref, v_ref,
                 pht_ref, bvt_ref, nsipht_ref, siv_ref, dx_ref, nis_ref,
                 s_scr):
    f32 = jnp.float32
    pht, si, siv = _chain_core(
        rows_ref, hc_ref, prows_ref, bmat_ref, vtf_ref, rmat_ref, v_ref, s_scr
    )
    pht_ref[:, :] = pht
    siv_ref[:, :] = siv
    dx_ref[:, :] = jax.lax.dot_general(
        siv, pht, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    nis_ref[0, 0] = jnp.sum(siv * v_ref[:, :])
    nsipht_ref[:, :] = -jax.lax.dot_general(
        si, pht, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    bvt_ref[:, :] = jax.lax.dot_general(
        bmat_ref[:, :], vtf_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )


def measurement_chain(p, rows, hc, bmat, vtf, rmat, v,
                      *, interpret: bool = False) -> MeasurementChain:
    """Run the fused measurement chain (see module docstring).

    Args (R = number of valid row indices, MP/RP pre-padded by caller
    conventions below):
      p:    (D, D) frame-start covariance (D % 128 == 0 for the TPU path).
      rows: (R,) int32 gathered row indices [0, 1, 2, slot rows...].
      hc:   (MP, RP) compact H — columns 0:3 pose Jacobians, block-diagonal
            per-measurement 2x2 feature Jacobians from column 3; zero rows
            for masked/padded measurements.  MP = round_up(2 NZ, 128),
            RP = round_up(R, 8).
      bmat: (NB, NB) frame-factor middle matrix.
      vtf:  (NB, D) = vmat.T frame-factor strip (the Hc V[rows] coupling is
            recovered in-kernel via the one-hot selector).
      rmat: (MP, MP) block-diagonal measurement noise; identity blocks on
            masked/padded measurements.
      v:    (MP,) stacked innovation (zero on masked/padded).

    Returns a MeasurementChain of padded outputs.  CPU (tests) uses an
    algebraically identical jnp path unless ``interpret=True``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = p.shape[0]
    mp = hc.shape[0]
    nb = bmat.shape[0]
    rp = _round_up(rows.shape[0], 8)
    nbp = _round_up(nb, 8)

    rows_p = jnp.full((1, rp), -1, jnp.int32).at[0, : rows.shape[0]].set(rows)
    prows = jnp.pad(p[rows], ((0, rp - rows.shape[0]), (0, 0)))
    hc = jnp.pad(hc, ((0, 0), (0, rp - hc.shape[1])))
    bmat = jnp.pad(bmat, ((0, nbp - nb), (0, nbp - nb)))
    vtf = jnp.pad(vtf, ((0, nbp - nb), (0, 0)))
    v2 = v.reshape(1, mp)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not interpret and not (on_tpu and d % 128 == 0):
        return _measurement_chain_reference(
            prows, rows_p[0], hc, bmat, vtf, rmat, v2
        )

    f32 = p.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((mp, d), f32),      # pht
        jax.ShapeDtypeStruct((nbp, d), f32),     # bvt
        jax.ShapeDtypeStruct((mp, d), f32),      # nsipht
        jax.ShapeDtypeStruct((1, mp), f32),      # siv
        jax.ShapeDtypeStruct((1, d), f32),       # dx
        jax.ShapeDtypeStruct((1, 1), f32),       # nis
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    pht, bvt, nsipht, siv, dx, nis = pl.pallas_call(
        _mega_kernel,
        out_shape=out_shapes,
        in_specs=[vspec] * 7,
        out_specs=(
            vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((mp, mp), f32)],
        interpret=interpret,
    )(rows_p, hc, prows, bmat, vtf, rmat, v2)
    return MeasurementChain(
        pht=pht, bvt=bvt, nsipht=nsipht, siv=siv[0], dx=dx[0], nis=nis[0, 0]
    )


class FrameUpdate(NamedTuple):
    """Outputs of the whole-frame fused update."""

    p: jax.Array        # (D, D)  updated covariance P + V B V^T - PHT^T S^-1 PHT
    dx: jax.Array       # (D,)    state-mean correction
    nis: jax.Array      # ()      stacked NIS


def _fused_kernel(rows_ref, hc_ref, prows_ref, bmat_ref, vtf_ref,
                  rmat_ref, v_ref, vtfp_ref, p_ref,
                  out_ref, dx_ref, nis_ref,
                  phtt_scr, nsipht_scr, bvt_scr, s_scr, *, tr):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _chain():
        pht, si, siv = _chain_core(
            rows_ref, hc_ref, prows_ref, bmat_ref, vtf_ref, rmat_ref, v_ref,
            s_scr,
        )
        # Stored transposed so the per-panel slice below lands on the
        # sublane dimension (lane-dim dynamic slices don't lower).
        phtt_scr[:, :] = pht.T
        nsipht_scr[:, :] = -jax.lax.dot_general(
            si, pht, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        bvt_scr[:, :] = jax.lax.dot_general(
            bmat_ref[:, :], vtf_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dx_ref[:, :] = jax.lax.dot_general(
            siv, pht, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        nis_ref[0, 0] = jnp.sum(siv * v_ref[:, :])

    out_ref[:, :] = (
        p_ref[:, :]
        + jax.lax.dot_general(
            vtfp_ref[:, :], bvt_scr[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            phtt_scr[pl.ds(i * tr, tr), :], nsipht_scr[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    )


def frame_update(p, rows, hc, bmat, vtf, rmat, v,
                 *, interpret: bool = False) -> FrameUpdate:
    """Whole observation frame in ONE Pallas dispatch.

    Fuses ``measurement_chain`` with the ``rank_update_t2`` row-panel pass:
    grid step 0 runs the measurement chain into persistent VMEM scratch
    (overlapping the serial S^-1 sweep with the panel DMA of P), and every
    grid step applies

        P_out[panel] = P[panel] + vtf[:, panel]^T (B vtf)
                                + pht[:, panel]^T (-S^-1 pht)

    against the resident strips.  HBM traffic = one read + one write of P
    per frame plus the small strips; the separate rank-update dispatch (and
    the pht/nsipht round trip through HBM) disappears.

    Args/padding conventions identical to ``measurement_chain``.
    """
    d = p.shape[0]
    mp = hc.shape[0]
    nb = bmat.shape[0]
    rp = _round_up(rows.shape[0], 8)
    nbp = _round_up(nb, 8)

    rows_p = jnp.full((1, rp), -1, jnp.int32).at[0, : rows.shape[0]].set(rows)
    prows = jnp.pad(p[rows], ((0, rp - rows.shape[0]), (0, 0)))
    hc = jnp.pad(hc, ((0, 0), (0, rp - hc.shape[1])))
    bmat = jnp.pad(bmat, ((0, nbp - nb), (0, nbp - nb)))
    vtf = jnp.pad(vtf, ((0, nbp - nb), (0, 0)))
    v2 = v.reshape(1, mp)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not interpret and not (on_tpu and d % 128 == 0):
        chain = _measurement_chain_reference(
            prows, rows_p[0], hc, bmat, vtf, rmat, v2
        )
        from conan_slam_tpu.ops.pallas_update import rank_update_t2_reference

        p_out = rank_update_t2_reference(
            p, vtf, chain.bvt, chain.pht, chain.nsipht
        )
        return FrameUpdate(p=p_out, dx=chain.dx, nis=chain.nis)

    f32 = p.dtype
    # Row-panel size: fixed VMEM pieces are the gathered strips + scratch
    # (~2 rp + 3 mp + 2 nbp rows of D) plus double-buffered (tr, D) in/out
    # panels; pick the largest tile that keeps the total under budget.
    fixed = (2 * rp + 3 * mp + 2 * nbp) * d * 4 + 2 * mp * mp * 4
    tr = 0
    for cand in (512, 256, 128):
        if d % cand:
            continue
        if fixed + 4 * cand * d * 4 <= 13 * 2**20:
            tr = cand
            break
    if tr == 0:
        # Strips too large for a resident one-dispatch schedule; fall back
        # to the two-dispatch pipeline (inputs are already padded, which the
        # entries re-pad idempotently).
        chain = measurement_chain(
            p, rows, hc, bmat, vtf, rmat, v, interpret=interpret
        )
        from conan_slam_tpu.ops.pallas_update import rank_update_t2

        p_out = rank_update_t2(
            p, vtf, chain.bvt, chain.pht, chain.nsipht, interpret=interpret
        )
        return FrameUpdate(p=p_out, dx=chain.dx, nis=chain.nis)

    cost = pl.CostEstimate(
        flops=2 * d * d * (mp + nbp) + 2 * mp * d * (rp + nbp),
        bytes_accessed=2 * d * d * 4 + (rp + mp + nbp) * d * 4,
        transcendentals=0,
    )
    grid = (d // tr,)
    bcast = lambda i: (0, 0)  # noqa: E731
    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((d, d), f32),       # p
        jax.ShapeDtypeStruct((1, d), f32),       # dx
        jax.ShapeDtypeStruct((1, 1), f32),       # nis
    )
    p_out, dx, nis = pl.pallas_call(
        functools.partial(_fused_kernel, tr=tr),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, rp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, d), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbp, nbp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbp, d), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbp, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), bcast, memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, mp), f32),    # pht^T
            pltpu.VMEM((mp, d), f32),    # -S^-1 pht
            pltpu.VMEM((nbp, d), f32),   # B vtf
            pltpu.VMEM((mp, mp), f32),   # sweep scratch
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(rows_p, hc, prows, bmat, vtf, rmat, v2, vtf, p)
    return FrameUpdate(p=p_out, dx=dx[0], nis=nis[0, 0])


def _measurement_chain_reference(prows, rows, hc, bmat, vtf, rmat, v2):
    """jnp reference of the kernel algebra (same padded inputs)."""
    from conan_slam_tpu.ops.spd_inverse import spd_inverse

    d = prows.shape[1]
    e_sel = (jnp.arange(d)[:, None] == rows[None, :]).astype(prows.dtype)
    hvm = jnp.matmul(
        hc, jnp.matmul(vtf, e_sel, precision=PRECISION).T, precision=PRECISION
    )
    pht = jnp.matmul(hc, prows, precision=PRECISION) + jnp.matmul(
        jnp.matmul(hvm, bmat, precision=PRECISION), vtf, precision=PRECISION
    )
    psub = jnp.matmul(pht, e_sel, precision=PRECISION)
    s = jnp.matmul(psub, hc.T, precision=PRECISION) + rmat
    si = spd_inverse(s)
    siv = v2[0] @ si
    return MeasurementChain(
        pht=pht,
        bvt=jnp.matmul(bmat, vtf, precision=PRECISION),
        nsipht=-jnp.matmul(si, pht, precision=PRECISION),
        siv=siv,
        dx=siv @ pht,
        nis=jnp.dot(siv, v2[0]),
    )
