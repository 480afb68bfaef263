"""Per-particle map maintenance: feature EKF updates and new features.

Reference: ``PF::featureUpdate`` (PF.cpp:222-277) — each observed feature's
2x2 EKF updates independently under the perfect-pose assumption — and
``PF::addOneNewFeature`` (PF.cpp:9-60).  Both are doubly batched here:
``vmap`` over particles x vectorised over the measurement buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conan_slam_tpu.core.geometry import wrap_angle
from conan_slam_tpu.core.linalg import inv2, sym
from conan_slam_tpu.filters.common import CompactObs
from conan_slam_tpu.filters.pf.state import ParticleEnsemble
from conan_slam_tpu.models import sensor


def feature_update(
    ens: ParticleEnsemble, obs: CompactObs, slots, mask, r_cov
) -> ParticleEnsemble:
    """2x2 Kalman update of each observed feature (reference PF.cpp:250-260).

    The reference routes these through the generic ``choleskyUpdate``; at 2x2
    a closed-form gain K = P H^T S^-1 is cheaper and exact.
    """
    safe_slots = jnp.clip(slots, 0, ens.capacity - 1)

    def one_particle(pose, xf, pf):
        xf_s = xf[safe_slots]                       # (NZ, 2)
        pf_s = pf[safe_slots]                       # (NZ, 2, 2)
        zp, _, hf = sensor.observe(pose, xf_s)
        v = obs.z - zp
        v = v.at[:, 1].set(wrap_angle(v[:, 1]))
        s = sym(jnp.einsum("nab,nbc,ndc->nad", hf, pf_s, hf) + r_cov)
        k = jnp.einsum("nab,ncb,ncd->nad", pf_s, hf, inv2(s))   # P H^T S^-1
        xf_new = xf_s + jnp.einsum("nab,nb->na", k, v)
        kh = jnp.einsum("nab,nbc->nac", k, hf)
        pf_new = sym(pf_s - jnp.einsum("nab,nbc->nac", kh, pf_s))
        xf_new = jnp.where(mask[:, None], xf_new, xf_s)
        pf_new = jnp.where(mask[:, None, None], pf_new, pf_s)
        return xf.at[safe_slots].set(xf_new), pf.at[safe_slots].set(pf_new)

    xf, pf = jax.vmap(one_particle)(ens.pose, ens.xf, ens.pf)
    return ens._replace(xf=xf, pf=pf)


def add_new_features(
    ens: ParticleEnsemble, obs: CompactObs, new_mask, r_cov
) -> ParticleEnsemble:
    """Initialise new features in every particle's map and assign shared slots.

    Reference PF.cpp:9-60 per particle; slot bookkeeping follows the EKF's
    table convention (the reference's PF table update iterates the wrong index
    vector and seeds slots from a particle count, PF.cpp:204-213 +
    main.cpp:299-300 — SURVEY.md defect 6; here slots are allocated from the
    shared active count exactly like the EKF path).
    """
    k_cap = ens.capacity
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    slots = ens.n_active + rank
    ok = jnp.logical_and(new_mask, slots < k_cap)
    safe_slots = jnp.where(ok, slots, k_cap)   # k_cap => dropped by scatter

    def one_particle(pose, xf, pf):
        xf_new, _, gz = sensor.init_feature(pose, obs.z)     # (NZ,2) (NZ,2,2)
        pf_new = jnp.einsum("nab,bc,ndc->nad", gz, r_cov, gz)
        xf = xf.at[safe_slots].set(xf_new, mode="drop")
        pf = pf.at[safe_slots].set(pf_new, mode="drop")
        return xf, pf

    xf, pf = jax.vmap(one_particle)(ens.pose, ens.xf, ens.pf)
    num_ids = ens.table.shape[0]
    table = ens.table.at[jnp.where(ok, obs.ids, num_ids)].set(
        slots.astype(jnp.int32), mode="drop"
    )
    return ens._replace(
        xf=xf,
        pf=pf,
        n_active=ens.n_active + jnp.sum(ok.astype(jnp.int32)),
        table=table,
    )
