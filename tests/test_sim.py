"""Simulation-layer tests: host truth rollout vs the on-device chain."""

import jax
import jax.numpy as jnp
import numpy as np

from conan_slam_tpu.config import SlamConfig
from conan_slam_tpu.runner.loop import _advance_truth
from conan_slam_tpu.sim.precompute import rollout_truth
from conan_slam_tpu.sim.steering import init_steer_state
from conan_slam_tpu.sim.world import default_world


def test_rollout_matches_device_truth_chain():
    world = default_world()
    cfg = SlamConfig(switch_control_noise=False)
    n = 4000

    roll = rollout_truth(np.asarray(world.waypoints), cfg, n)

    def step(carry, _):
        st, x_true = carry
        st, x_true, vn, swan = _advance_truth(
            st, x_true, world, cfg, jax.random.PRNGKey(0)
        )
        return (st, x_true), (x_true, st.swa, st.done)

    (_, _), (xs, swas, dones) = jax.lax.scan(
        step, (init_steer_state(cfg.number_loops), jnp.zeros(3, jnp.float32)),
        None, length=n,
    )
    np.testing.assert_allclose(np.asarray(xs), roll.x_true, rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(swas), roll.swa, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dones), roll.done)


def test_rollout_completes_course_with_loops():
    world = default_world()
    roll1 = rollout_truth(np.asarray(world.waypoints), SlamConfig(), 25000)
    assert roll1.done.any()
    t1 = roll1.done.argmax()
    roll2 = rollout_truth(np.asarray(world.waypoints), SlamConfig(number_loops=2), 50000)
    assert roll2.done.any()
    assert roll2.done.argmax() > 1.5 * t1
