"""Distributed particle filter: ensemble sharded over the ``particles`` axis.

The particle axis shards like a batch axis (DP analogue, SURVEY.md
section 2.2/5): predict, proposal and feature updates are embarrassingly
parallel and keep their single-device vmapped implementations — placement
via NamedSharding makes XLA partition them with zero communication.  The
only cross-particle exchanges are (a) the weight reduction for
normalisation/Neff and (b) the resampling gather (an all-to-all XLA emits
from the sharded ``take``), exactly the reference's lone synchronisation
point (PF.cpp:477-499).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from conan_slam_tpu.filters.pf.state import ParticleEnsemble
from conan_slam_tpu.parallel.mesh import PARTICLE_AXIS


def particle_sharding(mesh, axis: str = PARTICLE_AXIS):
    """Shardings for each ensemble leaf: particle-axis leaves split, shared
    map bookkeeping replicated."""
    split = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return ParticleEnsemble(
        log_w=split,
        pose=split,
        pose_cov=split,
        xf=split,
        pf=split,
        n_active=repl,
        table=repl,
    )


def shard_ensemble(mesh, ens: ParticleEnsemble, axis: str = PARTICLE_AXIS) -> ParticleEnsemble:
    """Place an ensemble on the mesh (particle count must divide the axis)."""
    shardings = particle_sharding(mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, ens, shardings)


def constrain(ens: ParticleEnsemble, mesh, axis: str = PARTICLE_AXIS) -> ParticleEnsemble:
    """In-jit sharding constraint keeping the ensemble on its layout."""
    shardings = particle_sharding(mesh, axis)
    return jax.tree_util.tree_map(jax.lax.with_sharding_constraint, ens, shardings)
