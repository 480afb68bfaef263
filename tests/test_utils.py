"""Checkpoint/restore and loop-closure frontend tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conan_slam_tpu.filters import ekf
from conan_slam_tpu.graph.frontend import ClosureConfig, relax_trajectory
from conan_slam_tpu.graph.pose_graph import graph_error
from conan_slam_tpu.utils import checkpoint


def test_checkpoint_roundtrip_ekf_state(tmp_path):
    state = ekf.init_state(8, 12)
    state = state._replace(
        x=state.x.at[:3].set(jnp.asarray([1.0, 2.0, 0.3])),
        n_active=jnp.int32(5),
        table=state.table.at[2].set(4),
    )
    path = os.path.join(tmp_path, "ckpt")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, ekf.init_state(8, 12))
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_frontend_relaxes_drifting_trajectory():
    # Synthetic figure: truth goes around a loop; estimate drifts linearly.
    t = 800
    ang = np.linspace(0, 2 * np.pi, t).astype(np.float32)
    truth = np.stack(
        [200 * np.sin(ang), 200 * (1 - np.cos(ang)), ang + np.pi / 2], axis=1
    ).astype(np.float32)
    drift = np.linspace(0, 1, t)[:, None] * np.asarray([[15.0, -10.0, 0.0]])
    est = (truth + drift).astype(np.float32)
    valid = np.ones((t,), bool)

    cfg = ClosureConfig(keyframe_stride=20, radius=60.0, min_index_gap=10)
    g, g_opt = relax_trajectory(
        jnp.asarray(est), jnp.asarray(truth), jnp.asarray(valid), cfg,
        jax.random.PRNGKey(0), iterations=10, cg_iterations=60,
    )
    assert float(graph_error(g_opt)) < float(graph_error(g))
    # End-of-loop error vs truth should shrink substantially after relaxation.
    err_before = np.linalg.norm(est[::20][-1, :2] - truth[::20][-1, :2])
    err_after = np.linalg.norm(
        np.asarray(g_opt.nodes)[-1, :2] - truth[::20][-1, :2]
    )
    assert err_after < 0.5 * err_before, (err_before, err_after)
