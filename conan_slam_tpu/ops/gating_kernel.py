"""Blocked Pallas gating kernel for Mahalanobis NN association.

Reference: ``EKF::dataAssociate`` / ``computeAssociation``
(EKF.cpp:235-326, 131-144) — the reference's own flagged O(N) weakness
(slam.h:473-475).  The jnp path (filters.ekf.associate.associate_gated)
computes the (NZ, K) NIS matrix with batched 2x2 ``dot_general`` chains;
XLA maps each tiny batched matmul onto padded MXU tiles, so at bench scale
the association chain costs ~5x the whole measurement update.

This kernel runs the complete association in ONE dispatch, tiled over
K-slot lane panels:

  per slot j (lane-parallel):  zp_j, the 2x2 innovation covariance
      S_j = Hv Pvv Hv^T + Hv Pvj Hf^T + (.)^T + Hf Pjj Hf^T + R
  expanded to scalar lane FMAs against the 9 pose-block scalars, the 6
  pose-feature strip rows and the 3 feature-block diagonals;
  per measurement i (sublane-parallel):
      nis_ij = v^T S_j^-1 v,  nd_ij = nis_ij + log|S_j|
  then a running masked (arg)min over panels.

The virtual-covariance correction (gating against P + V B V^T while the
frame factors are pending) is folded by the HOST into the pose block /
strips / diagonals before the kernel — O(K r) work in a few fused XLA ops.

Outputs per measurement: best nd, best slot, min NIS — exactly the
quantities ``associate_gated`` derives its known/new masks from.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conan_slam_tpu.ops.frame_kernel import _atan2, _wrap

_BIG = 3.0e38


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _gating_kernel(zcol_ref, pose_ref, pvv_ref, rsc_ref, slot_ref, band_ref,
                   out_ref, acc_scr, *, kt, n_panels, gate_reject):
    f32 = jnp.float32
    i = pl.program_id(0)
    nzm = zcol_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        acc_scr[:, :] = jnp.full((nzm, 8), _BIG, f32)

    px = pose_ref[0]
    py = pose_ref[1]
    phi = pose_ref[2]

    fx = slot_ref[0:1, :]                                  # (1, KT)
    fy = slot_ref[1:2, :]
    pvx0 = slot_ref[2:3, :]
    pvx1 = slot_ref[3:4, :]
    pvx2 = slot_ref[4:5, :]
    pvy0 = slot_ref[5:6, :]
    pvy1 = slot_ref[6:7, :]
    pvy2 = slot_ref[7:8, :]
    p00 = band_ref[0:1, :]
    p01 = band_ref[1:2, :]
    p11 = band_ref[2:3, :]
    act = band_ref[3:4, :] > 0.5

    dx = fx - px
    dy = fy - py
    d2 = jnp.maximum(dx * dx + dy * dy, 1e-12)
    dist = jnp.sqrt(d2)
    zpr = dist
    zpb = _atan2(dy, dx) - phi
    xd = dx / dist
    yd = dy / dist
    xd2 = dx / d2
    yd2 = dy / d2

    # Hv rows a = (-xd, -yd, 0), b = (yd2, -xd2, -1); Hf rows c = (xd, yd),
    # e = (-yd2, xd2).  Quadratic forms expanded to lane FMAs.
    q00 = pvv_ref[0]
    q01 = pvv_ref[1]
    q02 = pvv_ref[2]
    q11 = pvv_ref[4]
    q12 = pvv_ref[5]
    q22 = pvv_ref[8]
    # a^T Pvv a
    apa = q00 * xd * xd + 2.0 * q01 * xd * yd + q11 * yd * yd
    # a^T Pvv b
    apb = (
        -xd * (q00 * yd2 - q01 * xd2 - q02)
        - yd * (q01 * yd2 - q11 * xd2 - q12)
    )
    # b^T Pvv b
    bpb = (
        yd2 * (q00 * yd2 - q01 * xd2 - q02)
        - xd2 * (q01 * yd2 - q11 * xd2 - q12)
        - (q02 * yd2 - q12 * xd2 - q22)
    )
    # Pvj columns (per slot): col x = (pvx0, pvx1, pvx2), col y = (pvy...).
    # a^T Pvj c: a = (-xd, -yd, 0), c = (xd, yd).
    apx = -xd * pvx0 - yd * pvx1
    apy = -xd * pvy0 - yd * pvy1
    bpx = yd2 * pvx0 - xd2 * pvx1 - pvx2
    bpy = yd2 * pvy0 - xd2 * pvy1 - pvy2
    apc = apx * xd + apy * yd
    ape = -apx * yd2 + apy * xd2
    bpc = bpx * xd + bpy * yd
    bpe = -bpx * yd2 + bpy * xd2
    # Hf Pjj Hf^T.
    cjc = xd * (p00 * xd + p01 * yd) + yd * (p01 * xd + p11 * yd)
    cje = -(p00 * xd + p01 * yd) * yd2 + (p01 * xd + p11 * yd) * xd2
    eje = -yd2 * (-p00 * yd2 + p01 * xd2) + xd2 * (-p01 * yd2 + p11 * xd2)

    s00 = apa + 2.0 * apc + cjc + rsc_ref[0]
    s01 = apb + ape + bpc + cje + rsc_ref[1]
    s11 = bpb + 2.0 * bpe + eje + rsc_ref[3]

    det = jnp.maximum(s00 * s11 - s01 * s01, 1e-30)
    idet = 1.0 / det
    i00 = s11 * idet
    i01 = -s01 * idet
    i11 = s00 * idet
    logdet = jnp.log(det)

    zr = zcol_ref[:, 0:1]                                  # (NZM, 1)
    zb = zcol_ref[:, 1:2]
    vr = zr - zpr                                          # (NZM, KT)
    vb = _wrap(zb - zpb)
    nis = i00 * vr * vr + 2.0 * i01 * vr * vb + i11 * vb * vb
    nd = nis + logdet

    nis_act = jnp.where(act, nis, _BIG)
    nd_g = jnp.where(jnp.logical_and(act, nis < gate_reject), nd, _BIG)

    jglob = (i * kt + jax.lax.broadcasted_iota(jnp.int32, (nzm, kt), 1)).astype(
        f32
    )
    pm_nd = jnp.min(nd_g, axis=1, keepdims=True)           # (NZM, 1)
    pm_j = jnp.min(
        jnp.where(nd_g == pm_nd, jglob, _BIG), axis=1, keepdims=True
    )
    pm_nis = jnp.min(nis_act, axis=1, keepdims=True)

    acc = acc_scr[:, :]
    cur_nd = acc[:, 0:1]
    cur_j = acc[:, 1:2]
    cur_nis = acc[:, 2:3]
    better = pm_nd < cur_nd
    new_nd = jnp.where(better, pm_nd, cur_nd)
    new_j = jnp.where(better, pm_j, cur_j)
    new_nis = jnp.minimum(pm_nis, cur_nis)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (nzm, 8), 1)
    acc_scr[:, :] = jnp.where(
        lane8 == 0, new_nd,
        jnp.where(lane8 == 1, new_j, jnp.where(lane8 == 2, new_nis, 0.0)),
    )

    @pl.when(i == n_panels - 1)
    def _emit():
        out_ref[:, :] = acc_scr[:, :]


def gating_scores(z, zmask, pose, features, active, pvv, pvm, pjj, r_cov,
                  gate_reject, *, interpret: bool = False):
    """Run the blocked gating kernel; returns ``(best_nd, best_j, min_nis)``
    per measurement ((NZ,) f32 / int32 / f32; ``best_nd`` >= _BIG/2 means no
    slot passed the gate).

    Args:
      z:        (NZ, 2) measured range/bearing.
      zmask:    (NZ,) bool measurement validity (only affects callers; all
                rows are scored).
      pose:     (3,) vehicle pose.
      features: (K, 2) slot positions.
      active:   (K,) bool active-slot mask.
      pvv:      (3, 3) pose covariance block (virtual-corrected by caller).
      pvm:      (K, 3, 2) pose-feature strips (virtual-corrected).
      pjj:      (K, 2, 2) feature diagonal blocks (virtual-corrected).
      r_cov:    (2, 2) measurement noise.
      gate_reject: static float NIS acceptance gate.
    """
    nz = z.shape[0]
    k = features.shape[0]
    f32 = jnp.float32
    nzm = _round_up(nz, 8)
    kt = min(512, _round_up(k, 128))
    kp = _round_up(k, kt)
    n_panels = kp // kt

    zcol = jnp.zeros((nzm, 8), f32)
    zcol = zcol.at[:nz, 0].set(z[:, 0])
    zcol = zcol.at[:nz, 1].set(z[:, 1])

    slotrows = jnp.zeros((8, kp), f32)
    slotrows = slotrows.at[0, :k].set(features[:, 0])
    slotrows = slotrows.at[1, :k].set(features[:, 1])
    slotrows = slotrows.at[2:5, :k].set(pvm[:, :, 0].T)
    slotrows = slotrows.at[5:8, :k].set(pvm[:, :, 1].T)

    band = jnp.zeros((8, kp), f32)
    band = band.at[0, :k].set(pjj[:, 0, 0])
    band = band.at[1, :k].set(0.5 * (pjj[:, 0, 1] + pjj[:, 1, 0]))
    band = band.at[2, :k].set(pjj[:, 1, 1])
    band = band.at[3, :k].set(active.astype(f32))

    pose_s = jnp.asarray(pose, f32).reshape(3)
    pvv_s = jnp.asarray(pvv, f32).reshape(9)
    rsc = jnp.asarray(r_cov, f32).reshape(4)

    kernel = functools.partial(
        _gating_kernel, kt=kt, n_panels=n_panels,
        gate_reject=float(gate_reject),
    )
    bcast = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nzm, 8), f32),
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec((nzm, 8), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, kt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nzm, 8), bcast, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nzm, 8), f32)],
        interpret=interpret,
    )(zcol, pose_s, pvv_s, rsc, slotrows, band)
    best_nd = out[:nz, 0]
    best_j = out[:nz, 1].astype(jnp.int32)
    min_nis = out[:nz, 2]
    return best_nd, best_j, min_nis
