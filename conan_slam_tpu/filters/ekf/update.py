"""EKF measurement update: batched and sequential forms.

Reference: ``EKF::batchUpdate`` (EKF.cpp:93-129), ``EKF::singleUpdate``
(EKF.cpp:457-479) and the dispatching ``EKF::update`` (EKF.cpp:481-496).
The batch form stacks all associated measurements into one joint Cholesky
update (one big MXU matmul chain); the sequential form reproduces the
order-dependent per-measurement semantics with a ``lax.scan``
(SURVEY.md section 7.3 item 2: don't silently parallelise where results
differ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conan_slam_tpu.core.geometry import wrap_angle
from conan_slam_tpu.filters.common import CompactObs
from conan_slam_tpu.filters.ekf.observe import build_batch_operator
from conan_slam_tpu.filters.ekf.state import EKFState
from conan_slam_tpu.models import sensor
from conan_slam_tpu.ops.cholesky_update import cholesky_update


def batch_update(state: EKFState, obs: CompactObs, slots, mask, r_cov,
                 *, return_nis: bool = False):
    """Joint update over all associated measurements (reference EKF.cpp:93-129)."""
    v, h, rr = build_batch_operator(state, obs, slots, mask, r_cov)
    out = cholesky_update(state.x, state.p, v, rr, h, return_nis=return_nis)
    x, p = out[:2]
    x = x.at[2].set(wrap_angle(x[2]))
    new_state = state._replace(x=x, p=p)
    if return_nis:
        return new_state, out[2]
    return new_state


def sequential_update(state: EKFState, obs: CompactObs, slots, mask, r_cov,
                      *, return_nis: bool = False):
    """Per-measurement updates in buffer order (reference EKF.cpp:457-479)."""
    d = state.x.shape[0]
    cap = state.capacity

    def body(carry, inp):
        x, p = carry
        z_i, slot_i, m_i = inp
        xf = jax.lax.dynamic_slice(x, (3 + 2 * slot_i,), (2,))
        zp, hv, hf = sensor.observe(x[:3], xf)
        v = jnp.stack([z_i[0] - zp[0], wrap_angle(z_i[1] - zp[1])])
        v = jnp.where(m_i, v, 0.0)
        h = jnp.zeros((2, d), dtype=p.dtype)
        h = h.at[:, :3].set(hv)
        h = jax.lax.dynamic_update_slice(h, hf, (0, 3 + 2 * slot_i))
        h = jnp.where(m_i, h, 0.0)
        r = jnp.where(m_i, r_cov, jnp.eye(2, dtype=p.dtype))
        x, p, nis_i = cholesky_update(x, p, v, r, h, return_nis=True)
        return (x, p), nis_i

    safe_slots = jnp.clip(slots, 0, cap - 1)
    (x, p), nis_seq = jax.lax.scan(
        body, (state.x, state.p), (obs.z, safe_slots, mask)
    )
    x = x.at[2].set(wrap_angle(x[2]))
    new_state = state._replace(x=x, p=p)
    if return_nis:
        return new_state, jnp.sum(nis_seq)
    return new_state


def update(state: EKFState, obs: CompactObs, slots, mask, r_cov, batch: bool,
           *, return_nis: bool = False):
    """Dispatch on the batch switch (reference EKF.cpp:481-496); ``batch`` is
    static config, so only one path is compiled."""
    if batch:
        return batch_update(state, obs, slots, mask, r_cov,
                            return_nis=return_nis)
    return sequential_update(state, obs, slots, mask, r_cov,
                             return_nis=return_nis)


def fused_frame_step(
    state: EKFState, vns, swans, phis, actives, q_cov, obs: CompactObs,
    slots, mask, r_cov, wheel_base, dt, sigma_heading, use_heading: bool,
    *, interpret: bool = False,
):
    """Known-association whole frame — S predict+heading sub-steps, observe,
    measurement update — as ONE device kernel where shapes allow.

    Semantically identical to ``frame_factors_fused`` (the factor recursion)
    followed by ``fused_frame_update``; on the TPU path both collapse into
    ``ops.frame_kernel.frame_step`` so the only inter-kernel work per frame
    is the association table lookup and three small row gathers of P/x.
    Returns ``(new_state, pose_trace (S, 3), nis_per_measurement)``.
    """
    from conan_slam_tpu.ops.frame_kernel import can_fuse_frame_step, frame_step

    d = state.x.shape[0]
    nz = obs.z.shape[0]
    cap = state.capacity
    safe = jnp.clip(slots, 0, cap - 1)
    rows2 = (3 + 2 * safe[:, None] + jnp.arange(2)[None, :]).reshape(-1)
    rows131 = jnp.concatenate([jnp.arange(3, dtype=rows2.dtype), rows2])

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (on_tpu or interpret) and can_fuse_frame_step(d, nz):
        fs = frame_step(
            state.p, state.x, rows131, vns, swans, phis, actives, q_cov,
            obs.z[:, 0], obs.z[:, 1], mask, r_cov, wheel_base, dt,
            sigma_heading, use_heading, interpret=interpret,
        )
        new_state = state._replace(x=fs.x, p=fs.p)
        n_meas = jnp.maximum(jnp.sum(mask.astype(fs.x.dtype)), 1.0)
        return new_state, fs.pose_trace, fs.nis / n_meas

    from conan_slam_tpu.ops.factor_kernel import frame_factors_fused

    state1, pose_trace, vtf, bmat = frame_factors_fused(
        state, vns, swans, phis, actives, q_cov, wheel_base, dt,
        sigma_heading, use_heading,
    )
    state2, nis = fused_frame_update(
        state1, None, bmat, obs, slots, mask, r_cov,
        return_nis=True, vtf=vtf,
    )
    return state2, pose_trace, nis


def fused_frame_pair_step(
    state: EKFState, vns2, swans2, phis2, actives2, q_cov,
    obs_a: CompactObs, slots_a, mask_a, obs_b: CompactObs, slots_b, mask_b,
    r_cov, wheel_base, dt, sigma_heading, use_heading: bool,
    *, interpret: bool = False,
):
    """TWO known-association frames with ONE covariance pass
    (ops.frame_kernel.frame_step_pair); falls back to two sequential
    ``fused_frame_step`` calls where the pair kernel has no schedule.

    ``vns2``/``swans2``/``phis2``/``actives2`` carry both frames stacked on
    axis 0 (shape (2, S)).  Requires a static association table between the
    frames (augment disabled) — the caller guards this.  Returns
    ``(new_state, pose_trace (2, S, 3), nis (2,), pose_mid (3,))`` where
    ``pose_mid`` is frame A's post-update pose.
    """
    from conan_slam_tpu.ops.frame_kernel import (
        can_fuse_frame_pair,
        frame_step_pair,
    )

    d = state.x.shape[0]
    nz = obs_a.z.shape[0]
    cap = state.capacity

    def rows_for(slots):
        safe = jnp.clip(slots, 0, cap - 1)
        rows2 = (3 + 2 * safe[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        return jnp.concatenate([jnp.arange(3, dtype=rows2.dtype), rows2])

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (on_tpu or interpret) and can_fuse_frame_pair(d, nz):
        fp = frame_step_pair(
            state.p, state.x, rows_for(slots_a),
            (vns2[0], swans2[0], phis2[0], actives2[0]),
            (obs_a.z[:, 0], obs_a.z[:, 1], mask_a),
            rows_for(slots_b),
            (vns2[1], swans2[1], phis2[1], actives2[1]),
            (obs_b.z[:, 0], obs_b.z[:, 1], mask_b),
            q_cov, r_cov, wheel_base, dt, sigma_heading, use_heading,
            interpret=interpret,
        )
        new_state = state._replace(x=fp.x, p=fp.p)
        n_a = jnp.maximum(jnp.sum(mask_a.astype(fp.x.dtype)), 1.0)
        n_b = jnp.maximum(jnp.sum(mask_b.astype(fp.x.dtype)), 1.0)
        nis2 = fp.nis / jnp.stack([n_a, n_b])
        return new_state, fp.pose_trace, nis2, fp.pose_mid

    state1, pt_a, nis_a = fused_frame_step(
        state, vns2[0], swans2[0], phis2[0], actives2[0], q_cov, obs_a,
        slots_a, mask_a, r_cov, wheel_base, dt, sigma_heading, use_heading,
        interpret=interpret,
    )
    pose_mid = state1.x[:3]
    state2, pt_b, nis_b = fused_frame_step(
        state1, vns2[1], swans2[1], phis2[1], actives2[1], q_cov, obs_b,
        slots_b, mask_b, r_cov, wheel_base, dt, sigma_heading, use_heading,
        interpret=interpret,
    )
    return (
        state2,
        jnp.stack([pt_a, pt_b]),
        jnp.stack([nis_a, nis_b]),
        pose_mid,
    )


def fused_frame_update(
    state: EKFState, vmat, bmat, obs: CompactObs, slots, mask, r_cov,
    *, use_pallas: bool = True, return_nis: bool = False,
    interpret: bool = False, vtf=None, _force_gram: bool | None = None,
):
    """Frame-factored batch update: ONE rewrite of P per observation frame.

    ``state.p`` is the frame-START covariance; the frame's predict+heading
    effect is the factored correction ``vmat bmat vmat^T``
    (filters.ekf.fastframe.frame_factors).  The measurement update operates
    against the *virtual* covariance P' = P + V B V^T without materialising
    it:

        P' H^T = P H^T + V (B (V^T H^T))           (cheap: D x r extra)
        S      = H (P'H^T) + R;  chol; gains as in cholesky_update
        P_new  = P + V B V^T - W1 W1^T             (single fused pass;
                                                    ops.pallas_update)

    Masked measurements contribute nothing (zero H rows / identity R),
    so this runs unconditionally — a frame with no associated measurement
    degenerates to applying the factored correction alone.

    The small (2NZ, 2NZ) innovation covariance is inverted with ONE Pallas
    sweep kernel (ops.spd_inverse) instead of a cholesky + triangular-solve
    chain (the serialized device loops dominate at this size), and the
    measurement downdate folds into the factored rank update as a -S^-1
    middle block — P is read and written exactly once for the whole frame.

    The operator itself is never materialised: H touches only the 3 pose
    columns and the 2 columns of each measured slot, so P H'^T is assembled
    from a (2NZ, D) *row gather* of the symmetric P (plus the factored
    V B V^T correction) instead of a dense (D, D) x (D, 2NZ) matmul — the
    only full pass over P in the whole frame is the final fused rank update.
    """
    from conan_slam_tpu.core.linalg import PRECISION, sym
    from conan_slam_tpu.models import sensor
    from conan_slam_tpu.ops.pallas_update import (
        rank_update_t,
        rank_update_t_reference,
    )
    from conan_slam_tpu.ops.spd_inverse import spd_inverse

    d = state.x.shape[0]
    nz = obs.z.shape[0]
    cap = state.capacity
    if bmat is None:
        # Degenerate frame factors (plain measurement-only update).
        bmat = jnp.zeros((8, 8), dtype=state.p.dtype)
        vtf = jnp.zeros((8, d), dtype=state.p.dtype)
        vmat = None
    safe = jnp.clip(slots, 0, cap - 1)
    rows2 = (3 + 2 * safe[:, None] + jnp.arange(2)[None, :]).reshape(-1)

    # --- megakernel path: the WHOLE frame as ONE Pallas dispatch ---
    # (observe + compact-H/R/innovation assembly + measurement chain +
    # P row-panel rank update, ops.frame_kernel.frame_update_obs).  The
    # host side contributes only the slot-row indices and three tiny
    # pre-gathered strips.  can_fuse_frame is the SAME VMEM-feasibility
    # predicate the kernel itself uses to pick its schedule, so this branch
    # is taken exactly when the one-dispatch schedule actually runs.
    from conan_slam_tpu.ops.frame_kernel import can_fuse_frame, frame_update_obs

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (
        use_pallas
        and (on_tpu or interpret)
        and can_fuse_frame(d, nz, bmat.shape[0])
    ):
        rows131 = jnp.concatenate([jnp.arange(3, dtype=rows2.dtype), rows2])
        vtf_use = vmat.T if vtf is None else vtf
        fu = frame_update_obs(
            state.p, state.x, rows131, obs.z[:, 0], obs.z[:, 1], mask, r_cov,
            bmat, vtf_use, interpret=interpret,
        )
        new_state = state._replace(x=fu.x, p=fu.p)
        if return_nis:
            n_meas = jnp.maximum(jnp.sum(mask.astype(fu.x.dtype)), 1.0)
            return new_state, fu.nis / n_meas
        return new_state

    xf = state.features[safe]                                    # (NZ, 2)
    zp, hv, hf = sensor.observe(state.pose, xf)
    hv = jnp.where(mask[:, None, None], hv, 0.0)                 # (NZ, 2, 3)
    hf = jnp.where(mask[:, None, None], hf, 0.0)                 # (NZ, 2, 2)
    dz = obs.z - zp
    v = jnp.stack([dz[:, 0], wrap_angle(dz[:, 1])], axis=-1)
    v = jnp.where(mask[:, None], v, 0.0).reshape(2 * nz)

    # --- phtT = H (P + V B V^T) as (2NZ, D) row strips ---
    if vmat is None:
        vmat = vtf.T
    prow_pose = state.p[:3, :]                                   # (3, D)
    prow_slot = state.p[rows2, :].reshape(nz, 2, d)              # row gather
    hv2 = hv.reshape(2 * nz, 3)
    phtT = jnp.matmul(hv2, prow_pose, precision=PRECISION) + jnp.sum(
        hf[:, :, :, None] * prow_slot[:, None, :, :], axis=2
    ).reshape(2 * nz, d)
    # Factored correction: (H V) B V^T.
    hvm = jnp.matmul(hv2, vmat[:3, :], precision=PRECISION) + jnp.sum(
        hf[:, :, :, None] * vmat[rows2, :].reshape(nz, 2, -1)[:, None, :, :],
        axis=2,
    ).reshape(2 * nz, -1)                                        # (2NZ, r)
    phtT = phtT + jnp.matmul(
        jnp.matmul(hvm, bmat, precision=PRECISION), vmat.T, precision=PRECISION
    )

    # --- S = phtT H^T + R: H^T touches the same pose/slot columns ---
    s = jnp.matmul(phtT[:, :3], hv2.T, precision=PRECISION)      # (2NZ, 2NZ)
    ph_slot = phtT[:, rows2].reshape(2 * nz, nz, 2)
    s = s + jnp.sum(
        ph_slot[:, :, None, :] * hf[None, :, :, :], axis=3
    ).reshape(2 * nz, 2 * nz)
    eye2 = jnp.eye(2, dtype=s.dtype)
    rblocks = jnp.where(mask[:, None, None], r_cov, eye2)        # (NZ, 2, 2)
    idx = jnp.arange(nz)
    s = s.reshape(nz, 2, nz, 2).at[idx, :, idx, :].add(rblocks).reshape(
        2 * nz, 2 * nz
    )
    s = sym(s)

    si = spd_inverse(s)                                          # (2NZ, 2NZ)
    siv = si @ v
    x = state.x + siv @ phtT
    x = x.at[2].set(wrap_angle(x[2]))

    # P <- P + [V PHT] [[B, 0], [0, -S^-1]] [V PHT]^T in one fused pass.
    # The factor strips stay ROW-major (phtT is already (2NZ, D)); only the
    # small (r, D) vmat transpose is materialised.
    nb = bmat.shape[0]
    m = s.shape[0]
    # Big-D gated rank pass precision (VERDICT r4 tasks 2/8): the fp32-
    # contract (HIGHEST) pass is 12.1 of the 13.4 ms frame at the 10k-
    # landmark shape.  MEASURED NEGATIVE RESULTS (rounds 4-5, full
    # 25k-step 10k-landmark course each):
    #   split3/4 (16-bit splits, round 4):   ATE 11.4 m — asymmetric error.
    #   signed-Gram split3 (round 5):        ATE nan — symmetry is NOT the
    #       binding constraint; mapping from scratch collapses a fresh
    #       landmark's ~35 m prior (1 deg bearing at 2000 m) to ~0.1 m in
    #       ONE observation (ratio ~1e-4), so a 2^-16-relative product
    #       error exceeds the posterior and variances go negative.
    #   "hi6" (3-way bf16, ~22 effective mantissa bits, 6 stacked passes,
    #       ~0.75x HIGHEST cost, round 5): numerically stable (no nan,
    #       471 vs 356 steps/s) but the association GATES are more
    #       sensitive than the variances: mapped count 614 -> 226 and ATE
    #       0.213 -> 0.726 m — the NIS reject/augment thresholds flip on
    #       sub-percent covariance perturbations.
    # CONCLUSION: data association under mapping-from-scratch requires the
    # full fp32 product; the tier stays HIGHEST by default.  hi6 remains
    # available (_force_gram=True / rank_update_t mode="hi6") for
    # workloads whose gates tolerate it.
    use_hi6 = False if _force_gram is None else _force_gram
    vt = jnp.concatenate([vmat.T, phtT], axis=0)                 # (nb+2NZ, D)
    bbig = jnp.zeros((nb + m, nb + m), dtype=bmat.dtype)
    bbig = bbig.at[:nb, :nb].set(bmat)
    bbig = bbig.at[nb:, nb:].set(-si)
    if use_hi6:
        p = rank_update_t(state.p, vt, bbig, mode="hi6")
    else:
        apply = rank_update_t if use_pallas else rank_update_t_reference
        p = apply(state.p, vt, bbig)
    new_state = state._replace(x=x, p=p)
    if return_nis:
        # v^T S^-1 v: the stacked NIS, normalised per associated measurement
        # (a chi^2_2 consistency statistic).
        n_meas = jnp.maximum(jnp.sum(mask.astype(v.dtype)), 1.0)
        return new_state, jnp.dot(v, siv) / n_meas
    return new_state
