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
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_gram = (
        (use_pallas and on_tpu and d >= 4096)
        if _force_gram is None else _force_gram
    )
    if use_gram:
        # SIGNED-GRAM fast tier for the big-D gated path (VERDICT r4 task
        # 2): the fp32-contract pass was 12.1 of the 13.4 ms frame at the
        # 10k-landmark shape, and the plain split tier is banned here —
        # its ASYMMETRIC truncation error feeds back through P and flips
        # associations (recorded round-4 failure, ATE 0.152 -> 11.4 m).
        # Rewriting the update as G^T diag(+-1) G makes the split error
        # SYMMETRIC BY CONSTRUCTION: rank_update_t with a diagonal middle
        # stacks the SAME bf16 hi/lo rounding of G on both operand sides,
        # so (i, j) and (j, i) accumulate identical term sets (asymmetry
        # stays at fp32-accumulation noise ~1e-7, the HIGHEST tier's own
        # level) while the product runs at the 3-pass bf16 rate.
        #   measurement: -pht^T S^-1 pht = -(L^T pht)^T (L^T pht), si=LL^T
        #   factors:     V B V^T = Wp^T Wp - c Vt^T Vt with
        #                Wp = chol(B + cI)^T V^T and c a Gershgorin bound
        #                (B is indefinite; the shift avoids a per-frame
        #                eigendecomposition).
        # Validated end-to-end: gated_full canary (config-2 uses the
        # megakernel path, unchanged) + full 25k-step 10k-landmark tour.
        from conan_slam_tpu.core.linalg import safe_cholesky as _chol

        # si is PSD only up to sweep rounding; a RELATIVE diagonal jitter
        # keeps the whitening Cholesky strictly PD (si entries span
        # ~1e-6..1e5 across range^2/bearing^2 units, so an absolute jitter
        # is meaningless).  A failed (zeroed) safe_cholesky would silently
        # drop the measurement downdate.
        dsi = jnp.diagonal(si)
        l_si = _chol(si + 1e-5 * jnp.diag(jnp.abs(dsi)))    # (m, m)
        w_meas = jnp.matmul(l_si.T, phtT, precision=PRECISION)
        # The factor middle B has the EXACT structure
        # [[p22, 1], [1, 0]] (+) diag(>= 0) (fastframe.coeff_frame_core:
        # bmat rows 260-268 — corner + unit process-noise / r_head gains),
        # so its eigendecomposition is closed form: corner eigenvalues
        # (p22 +- sqrt(p22^2 + 4))/2 with eigenvectors [lambda, 1].  This
        # keeps the signed-Gram factor magnitudes at B's own scale.
        # MEASURED NEGATIVE RESULT (round 5): a structure-agnostic
        # Gershgorin SHIFT factorization (chol(B + cI) Gram minus
        # c V V^T) detonated the 10k course (ATE 3.3e8 m): the two
        # shifted terms reach ~c|V|^2 ~ 1e6 at this shape (heading x
        # 2000 m lever arms in V) and their split3 rounding injects
        # O(10) absolute error into P per frame.  Exact small-eig
        # factors have no such cancellation.
        vmt = vmat.T                                        # (nb, D)
        p22 = bmat[0, 0]
        disc = jnp.sqrt(p22 * p22 + 4.0)
        lp = 0.5 * (p22 + disc)                             # > 0
        lm = 0.5 * (p22 - disc)                             # < 0
        np_ = jax.lax.rsqrt(lp * lp + 1.0)
        nm_ = jax.lax.rsqrt(lm * lm + 1.0)
        w_p = (jnp.sqrt(lp) * np_) * (lp * vmt[0] + vmt[1])
        w_m = (jnp.sqrt(-lm) * nm_) * (lm * vmt[0] + vmt[1])
        d_rest = jnp.diagonal(bmat)[2:]                     # >= 0
        w_rest = jnp.sqrt(jnp.maximum(d_rest, 0.0))[:, None] * vmt[2:]
        wa = jnp.concatenate(
            [w_p[None], w_m[None], w_rest, w_meas], axis=0
        )
        signs = jnp.concatenate([
            jnp.ones((1,), wa.dtype),
            -jnp.ones((1,), wa.dtype),
            jnp.ones((nb - 2,), wa.dtype),
            -jnp.ones((m,), wa.dtype),
        ])
        p = rank_update_t(state.p, wa, jnp.diag(signs), mode="split3")
    else:
        vt = jnp.concatenate([vmat.T, phtT], axis=0)             # (nb+2NZ, D)
        bbig = jnp.zeros((nb + m, nb + m), dtype=bmat.dtype)
        bbig = bbig.at[:nb, :nb].set(bmat)
        bbig = bbig.at[nb:, nb:].set(-si)
        apply = rank_update_t if use_pallas else rank_update_t_reference
        p = apply(state.p, vt, bbig)
    new_state = state._replace(x=x, p=p)
    if return_nis:
        # v^T S^-1 v: the stacked NIS, normalised per associated measurement
        # (a chi^2_2 consistency statistic).
        n_meas = jnp.maximum(jnp.sum(mask.astype(v.dtype)), 1.0)
        return new_state, jnp.dot(v, siv) / n_meas
    return new_state
