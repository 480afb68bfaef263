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


def batch_update(state: EKFState, obs: CompactObs, slots, mask, r_cov) -> EKFState:
    """Joint update over all associated measurements (reference EKF.cpp:93-129)."""
    v, h, rr = build_batch_operator(state, obs, slots, mask, r_cov)
    x, p = cholesky_update(state.x, state.p, v, rr, h)
    x = x.at[2].set(wrap_angle(x[2]))
    return state._replace(x=x, p=p)


def sequential_update(state: EKFState, obs: CompactObs, slots, mask, r_cov) -> EKFState:
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
        x, p = cholesky_update(x, p, v, r, h)
        return (x, p), None

    safe_slots = jnp.clip(slots, 0, cap - 1)
    (x, p), _ = jax.lax.scan(body, (state.x, state.p), (obs.z, safe_slots, mask))
    x = x.at[2].set(wrap_angle(x[2]))
    return state._replace(x=x, p=p)


def update(state: EKFState, obs: CompactObs, slots, mask, r_cov, batch: bool) -> EKFState:
    """Dispatch on the batch switch (reference EKF.cpp:481-496); ``batch`` is
    static config, so only one path is compiled."""
    if batch:
        return batch_update(state, obs, slots, mask, r_cov)
    return sequential_update(state, obs, slots, mask, r_cov)


def fused_frame_update(
    state: EKFState, vmat, bmat, obs: CompactObs, slots, mask, r_cov,
    *, use_pallas: bool = True, return_nis: bool = False,
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
    """
    import jax.scipy.linalg as jsl

    from conan_slam_tpu.core.linalg import PRECISION, safe_cholesky, sym
    from conan_slam_tpu.ops.pallas_update import rank_update_downdate

    v, h, rr = build_batch_operator(state, obs, slots, mask, r_cov)
    ht = h.T                                                     # (D, 2NZ)
    pht = jnp.matmul(state.p, ht, precision=PRECISION) + jnp.matmul(
        vmat,
        jnp.matmul(bmat, jnp.matmul(vmat.T, ht, precision=PRECISION),
                   precision=PRECISION),
        precision=PRECISION,
    )
    s = sym(jnp.matmul(h, pht, precision=PRECISION) + rr)
    chol = safe_cholesky(s)
    # Invert the small (2NZ, 2NZ) factor once, then hit the D-wide gain with
    # a dense MXU matmul — a triangular solve with a D-wide RHS serialises
    # on TPU.
    eye_m = jnp.eye(s.shape[0], dtype=s.dtype)
    linv = jsl.solve_triangular(chol, eye_m, lower=True)         # L^-1
    w1t = jnp.matmul(linv, pht.T, precision=PRECISION)           # (2NZ, D)
    lv = linv @ v
    x = state.x + w1t.T @ lv
    x = x.at[2].set(wrap_angle(x[2]))
    if use_pallas:
        p = rank_update_downdate(state.p, vmat, bmat, w1t.T)
    else:
        from conan_slam_tpu.ops.pallas_update import rank_update_downdate_reference

        p = rank_update_downdate_reference(state.p, vmat, bmat, w1t.T)
    new_state = state._replace(x=x, p=p)
    if return_nis:
        # ||L^-1 v||^2 = v^T S^-1 v: the stacked NIS, normalised per
        # associated measurement (a chi^2_2 consistency statistic).
        n_meas = jnp.maximum(jnp.sum(mask.astype(lv.dtype)), 1.0)
        return new_state, jnp.sum(lv * lv) / n_meas
    return new_state
