"""Rank-compounded frame updates: the EKF's speed-of-light time update.

Motivation (TPU roofline): per control step the reference-shaped pipeline
rewrites the full joint covariance twice for the heading observation
(rank-1 Joseph update, O(D^2) HBM traffic) and touches strips for predict —
at 100 Hz control / ~20 Hz observations that is ~13 full passes over P per
observation frame.  But every per-step covariance transform in the frame has
the special structure

    predict:  P <- G P G^T + F F^T,      G = I + u e2^T   (u in span{e0,e1})
    heading:  P <- C P C^T + r w w^T,    C = I - w e2^T,  w = P e2 / s

i.e. *all* multiplicative factors are of the form (I + a e2^T), which is
closed under composition:  (I + a e2^T)(I + b e2^T) = I + (a(1+b_2) + b) e2^T.
Therefore the whole frame collapses to

    P_frame = P0 + [m  p2] [[beta, 1],[1, 0]] [m  p2]^T
                 + sum_k F'_k F'_k^T  +  sum_k r w'_k w'_k^T

a single symmetric rank-(2 + 3*interval) update, where every vector
(m, the transformed noise factors F'_k, the transformed gains w'_k) is
computable from O(D) tracking of the single column P e2 — the only part of P
the heading gain ever reads.  HBM traffic per frame drops from ~13 full
passes over P to one, and the mean corrections accumulate as
x += sum_k v_k w_k.

Sequential equivalence is exact in real arithmetic; float32 agreement is
validated against the step-by-step implementation in tests/test_fastframe.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from conan_slam_tpu.core.geometry import wrap_angle
from conan_slam_tpu.core.linalg import PRECISION
from conan_slam_tpu.filters.ekf.state import EKFState
from conan_slam_tpu.models import motion


def frame_predict_heading(
    state: EKFState,
    vns,            # (S,) noisy velocity per sub-step
    swans,          # (S,) noisy steering per sub-step
    phi_meas,       # (S,) true heading measurement per sub-step
    active,         # (S,) bool: sub-step executes (False once course done)
    q_cov,          # (2, 2) filter control noise
    wheel_base,
    dt,
    sigma_heading,
    use_heading: bool,
    return_pose_trace: bool = False,
):
    """Apply ``S`` (predict + heading-observe) sub-steps as one rank update.

    Equivalent to S iterations of filters.ekf.predict + observe_heading
    (reference EKF.cpp:406-455, 328-352) with identical inputs.  With
    ``return_pose_trace`` also returns the exact (S, 3) per-sub-step pose
    means (the pose is tracked exactly through the compounding).
    """
    x, pose_trace, vmat, bmat = _frame_core(
        state, vns, swans, phi_meas, active, q_cov, wheel_base, dt,
        sigma_heading, use_heading,
    )
    p = state.p + jnp.matmul(
        jnp.matmul(vmat, bmat, precision=PRECISION),
        vmat.T,
        precision=PRECISION,
    )
    new_state = state._replace(x=x, p=p)
    if return_pose_trace:
        return new_state, pose_trace
    return new_state


def frame_factors(
    state: EKFState,
    vns, swans, phi_meas, active,
    q_cov, wheel_base, dt, sigma_heading, use_heading: bool,
):
    """Like ``frame_predict_heading`` but WITHOUT materialising P.

    Returns (state_with_updated_mean_and_STALE_P, pose_trace (S, 3),
    vmat (D, r), bmat (r, r)); the frame's covariance effect is
    P_frame = state.p + vmat bmat vmat^T.  Consumers fold the factors into
    the measurement update so P is rewritten exactly once per frame
    (filters.ekf.update.fused_frame_update + ops.pallas_update).
    """
    x, pose_trace, vmat, bmat = _frame_core(
        state, vns, swans, phi_meas, active, q_cov, wheel_base, dt,
        sigma_heading, use_heading,
    )
    return state._replace(x=x), pose_trace, vmat, bmat


def _frame_core(
    state: EKFState,
    vns, swans, phi_meas, active,
    q_cov, wheel_base, dt, sigma_heading, use_heading: bool,
):
    """Shared S-sub-step compounding; returns (x, pose_trace, vmat, bmat)."""
    s_steps = len(vns) if isinstance(vns, (list, tuple)) else vns.shape[0]
    d = state.x.shape[0]
    dtype = state.p.dtype
    r_head = jnp.asarray(sigma_heading**2, dtype)

    # Cholesky factor of q (diagonal in every config; general form kept).
    q_chol = jnp.linalg.cholesky(q_cov)

    pose = state.pose
    col2 = state.p[:, 2]
    p22_0 = col2[2]
    p2_0 = col2

    e2 = jnp.zeros((d,), dtype).at[2].set(1.0)

    # Per-substep collected quantities.
    a_list = []        # composition vectors a_k of (C_k G_k) = I + a_k e2^T
    f_list = []        # noise factors F_k (D, 2) *before* suffix transforms
    w_list = []        # heading gains w_k (D,)
    v_list = []        # heading innovations v_k (scalars)
    pose_trace = []    # exact pose mean after each sub-step

    for k in range(s_steps):
        act = active[k]
        vn = vns[k]
        swan = swans[k]

        # --- predict ---
        gv, gu = motion.jacobians(pose, vn, swan, wheel_base, dt)
        # G = I + u e2^T with u = (Gv[0,2], Gv[1,2], 0, ...).
        u = jnp.zeros((d,), dtype).at[0].set(gv[0, 2]).at[1].set(gv[1, 2])
        u = jnp.where(act, u, 0.0)
        f = jnp.zeros((d, 2), dtype).at[:3, :].set(
            jnp.matmul(gu, q_chol, precision=PRECISION)
        )
        f = jnp.where(act, f, 0.0)
        # col2 <- G col2 + (F F^T) e2  =  col2 + u col2[2] + F F[2,:]^T.
        col2 = col2 + u * col2[2] + f @ f[2, :]
        pose_new = motion.step(pose, vn, swan, wheel_base, dt)
        pose = jnp.where(act, pose_new, pose)

        # --- heading observation ---
        if use_heading:
            s_k = col2[2] + r_head
            w = jnp.where(act, col2 / s_k, 0.0)
            v = jnp.where(act, wrap_angle(phi_meas[k] - pose[2]), 0.0)
            # col2' = (1 - w2)(col2 - w col2[2]) + r w2 w.
            w2 = w[2]
            col2 = jnp.where(
                act, (1.0 - w2) * (col2 - w * col2[2]) + r_head * w2 * w, col2
            )
            # Pose mean correction from this heading update (rows 0:3 of w).
            pose = pose + w[:3] * v
            pose = pose.at[2].set(wrap_angle(pose[2]))
            a = u - w   # (C G) = I + (u - w(1 + u_2)) e2^T with u_2 = 0.
        else:
            w = jnp.zeros((d,), dtype)
            v = jnp.asarray(0.0, dtype)
            a = u
        a_list.append(a)
        f_list.append(f)
        w_list.append(w)
        v_list.append(v)
        pose_trace.append(pose)

    # --- suffix composition: t_k = transform AFTER sub-step k (for w terms),
    #     s_k = t_k composed with C_k (for F terms), m = full composition ---
    def compose(b, a):
        """(I + a e2^T)(I + b e2^T) -> coefficient a(1 + b_2) + b."""
        return a * (1.0 + b[2]) + b

    t = [None] * s_steps
    acc = jnp.zeros((d,), dtype)           # identity
    for k in range(s_steps - 1, -1, -1):
        t[k] = acc
        acc = compose(a_list[k], acc)      # prepend (C_k G_k)
    m = acc

    # Transformed factors.
    w_prime = [w_list[k] + t[k] * w_list[k][2] for k in range(s_steps)]
    # F term enters after C_k: suffix transform is t_k composed with C_k,
    # i.e. coefficient c_k = compose(-w_k, t_k) acting as (I + c e2^T).
    f_prime = []
    for k in range(s_steps):
        c_k = compose(-w_list[k], t[k]) if use_heading else t[k]
        f_prime.append(f_list[k] + jnp.outer(c_k, f_list[k][2, :]))

    # --- mean: map components get sum_k v_k (transformed w_k);
    #     the pose part was tracked exactly above.  A heading correction at
    #     sub-step k to the mean is NOT transformed by later covariance
    #     factors (the mean evolves additively), so plain w_k applies. ---
    x = state.x
    if use_heading:
        corr = sum(v_list[k] * w_list[k] for k in range(s_steps))
        x = x + corr.at[:3].set(0.0)
    x = x.at[:3].set(pose)

    # --- covariance: single symmetric rank update ---
    # columns: [m, p2] + S F-pairs + S w vectors.
    v_cols = [m, p2_0] + [f_prime[k][:, i] for k in range(s_steps) for i in (0, 1)]
    if use_heading:
        v_cols += w_prime
    vmat = jnp.stack(v_cols, axis=1)                    # (D, 2 + 2S [+ S])
    nb = vmat.shape[1]
    bmat = jnp.zeros((nb, nb), dtype)
    bmat = bmat.at[0, 0].set(p22_0)
    bmat = bmat.at[0, 1].set(1.0)
    bmat = bmat.at[1, 0].set(1.0)
    for i in range(2, 2 + 2 * s_steps):
        bmat = bmat.at[i, i].set(1.0)
    if use_heading:
        for i in range(2 + 2 * s_steps, nb):
            bmat = bmat.at[i, i].set(r_head)

    return x, jnp.stack(pose_trace), vmat, bmat
