"""Pose-graph optimisation tests: residual correctness, convergence on a
noisy loop, closure detection."""

import jax
import jax.numpy as jnp
import numpy as np

from conan_slam_tpu.core.geometry import wrap_angle
from conan_slam_tpu.graph import pose_graph as pg


def _simulate_loop(n=40, drift=0.02, seed=0):
    """Square-ish loop: ground truth + odometry with heading drift."""
    rng = np.random.default_rng(seed)
    truth = np.zeros((n, 3), np.float32)
    step_len = 10.0
    for i in range(1, n):
        turn = (np.pi / 2) if i % (n // 4) == 0 else 0.0
        th = truth[i - 1, 2] + turn
        truth[i] = [
            truth[i - 1, 0] + step_len * np.cos(th),
            truth[i - 1, 1] + step_len * np.sin(th),
            th,
        ]
    truth[:, 2] = np.asarray(wrap_angle(jnp.asarray(truth[:, 2])))

    # Odometry measurements: true relative pose + noise.
    meas = []
    for i in range(n - 1):
        rel = pg.relative_pose(jnp.asarray(truth[i]), jnp.asarray(truth[i + 1]))
        noise = rng.normal(size=3).astype(np.float32) * [0.05, 0.05, drift]
        meas.append(np.asarray(rel) + noise)
    # Integrate noisy odometry for the initial guess.
    guess = np.zeros_like(truth)
    for i in range(n - 1):
        c, s = np.cos(guess[i, 2]), np.sin(guess[i, 2])
        guess[i + 1, 0] = guess[i, 0] + c * meas[i][0] - s * meas[i][1]
        guess[i + 1, 1] = guess[i, 1] + s * meas[i][0] + c * meas[i][1]
        guess[i + 1, 2] = guess[i, 2] + meas[i][2]
    return truth, np.asarray(meas, np.float32), guess


def _build_graph(truth, odo_meas, guess, closures):
    n = truth.shape[0]
    e_odo = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    edges = [e_odo]
    meas = [odo_meas]
    infos = [np.tile(np.diag([100.0, 100.0, 400.0]).astype(np.float32), (n - 1, 1, 1))]
    if closures:
        pairs = np.asarray(closures, np.int64)
        rel = np.stack(
            [
                np.asarray(pg.relative_pose(jnp.asarray(truth[i]), jnp.asarray(truth[j])))
                for i, j in pairs
            ]
        ).astype(np.float32)
        edges.append(pairs)
        meas.append(rel)
        infos.append(np.tile(np.diag([400.0, 400.0, 1600.0]).astype(np.float32),
                             (len(pairs), 1, 1)))
    edges = np.concatenate(edges)
    return pg.PoseGraph(
        nodes=jnp.asarray(guess),
        node_mask=jnp.ones((n,), bool),
        edges=jnp.asarray(edges, jnp.int32),
        meas=jnp.asarray(np.concatenate(meas)),
        info=jnp.asarray(np.concatenate(infos)),
        edge_mask=jnp.ones((edges.shape[0],), bool),
    )


def test_relative_pose_roundtrip():
    a = jnp.asarray([1.0, 2.0, 0.7])
    b = jnp.asarray([4.0, -1.0, -0.9])
    rel = pg.relative_pose(a, b)
    # Compose a with rel -> b.
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    x = a[0] + c * rel[0] - s * rel[1]
    y = a[1] + s * rel[0] + c * rel[1]
    th = wrap_angle(a[2] + rel[2])
    np.testing.assert_allclose([x, y, th], np.asarray(b), rtol=1e-5, atol=1e-5)


def test_optimize_reduces_error_and_recovers_loop():
    truth, odo, guess = _simulate_loop()
    closures = [(0, 39), (1, 38)]
    g = _build_graph(truth, odo, guess, closures)
    err0 = float(pg.graph_error(g))
    g_opt = pg.optimize(g, iterations=15, cg_iterations=60)
    err1 = float(pg.graph_error(g_opt))
    assert err1 < 0.1 * err0, (err0, err1)

    # End-point drift: before optimisation the integrated odometry drifts;
    # after, the loop ties the end back near truth.
    drift_before = np.linalg.norm(guess[-1, :2] - truth[-1, :2])
    drift_after = np.linalg.norm(np.asarray(g_opt.nodes)[-1, :2] - truth[-1, :2])
    assert drift_after < 0.5 * drift_before, (drift_before, drift_after)


def test_optimize_respects_masks():
    truth, odo, guess = _simulate_loop(n=20)
    g = _build_graph(truth, odo, guess, [])
    # Pad with garbage masked nodes/edges; results must be unaffected.
    pad_nodes = jnp.concatenate([g.nodes, jnp.full((5, 3), 1e6, jnp.float32)])
    pad_mask = jnp.concatenate([g.node_mask, jnp.zeros((5,), bool)])
    pad_edges = jnp.concatenate(
        [g.edges, jnp.asarray([[21, 23]] * 4, jnp.int32)]
    )
    pad_meas = jnp.concatenate([g.meas, jnp.ones((4, 3), jnp.float32)])
    pad_info = jnp.concatenate(
        [g.info, jnp.tile(jnp.eye(3)[None], (4, 1, 1)).astype(jnp.float32)]
    )
    pad_emask = jnp.concatenate([g.edge_mask, jnp.zeros((4,), bool)])
    g_pad = pg.PoseGraph(pad_nodes, pad_mask, pad_edges, pad_meas, pad_info, pad_emask)

    out_ref = pg.optimize(g, iterations=5, cg_iterations=30)
    out_pad = pg.optimize(g_pad, iterations=5, cg_iterations=30)
    np.testing.assert_allclose(
        np.asarray(out_pad.nodes)[:20], np.asarray(out_ref.nodes), rtol=1e-3, atol=1e-3
    )


def test_dead_reckoned_valet_chain_recovers_with_closures():
    """Config-4 regime end-to-end: dead-reckoned keyframe odometry on the
    return-home valet tour drifts without bound; closures + relaxation must
    recover the trajectory shape (aligned ATE drops several-fold)."""
    import jax
    import jax.numpy as jnp

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.graph.frontend import ClosureConfig, simulate_odometry_graph
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.sim.precompute import rollout_truth
    from conan_slam_tpu.sim.world import default_world

    del default_world  # star-polygon tour: the path self-intersects many
    # times (transverse crossings), the geometry loop closure needs — a
    # single-revisit tour caps recovery at ~2.7x (closures only constrain
    # the revisit site; mid-chain wander is genuinely unobservable).
    r_c = 4000.0
    ang = np.arange(8) * 2 * np.pi / 8
    pts = np.stack([r_c * np.cos(ang), r_c * np.sin(ang)], axis=1)
    order = [(3 * i) % 8 for i in range(8)] + [0]
    wp = np.concatenate([np.zeros((1, 2), np.float32), pts[order]]).astype(np.float32)
    cfg = SlamConfig()
    n = 60000
    roll = rollout_truth(wp, cfg, n)
    truth = jnp.asarray(roll.x_true)
    valid = jnp.asarray(~roll.done)

    ccfg = ClosureConfig(odo_sigma_xy=0.5, odo_sigma_th=0.01,
                         max_closures=256, min_index_gap=60)
    g = simulate_odometry_graph(truth, valid, ccfg, jax.random.PRNGKey(0))
    g_opt = pg.optimize(
        g, iterations=15, cg_iterations=g.nodes.shape[0], chordal_init=True
    )

    stride = ccfg.keyframe_stride
    kf_true = truth[::stride][: g.nodes.shape[0]]
    kf_valid = valid[::stride][: g.nodes.shape[0]]

    def ate(nodes):
        return float(metrics.aligned_ate_rmse(kf_true, nodes, kf_valid))

    before, after = ate(g.nodes), ate(g_opt.nodes)
    assert before > 20.0, before          # dead reckoning really drifts
    assert after < 0.35 * before, (before, after)
    assert float(pg.graph_error(g_opt)) < float(pg.graph_error(g))


def test_detect_loop_closures_finds_revisit():
    # Trajectory that returns to the start.
    n = 30
    t = np.linspace(0, 2 * np.pi, n).astype(np.float32)
    nodes = np.stack([100 * np.sin(t), 100 * (1 - np.cos(t)), t], axis=1)
    pairs, mask = pg.detect_loop_closures(
        jnp.asarray(nodes), jnp.ones((n,), bool),
        max_candidates=8, radius=30.0, min_index_gap=15,
    )
    found = {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(mask)) if m}
    assert found, "no closures found"
    # All found pairs must straddle the revisit (start vs end of the circle).
    for i, j in found:
        assert j - i >= 15
        d = np.linalg.norm(nodes[i, :2] - nodes[j, :2])
        assert d < 30.0


def test_iterated_redetection_recovers_closures_without_oracle():
    # relax_trajectory(rounds>1, detect_on_estimate=True): detection against
    # the DRIFTED estimate misses revisits in round 1; relaxation pulls the
    # trajectory toward truth and later rounds recover them.  The iterated
    # no-oracle pipeline must (a) find more closures than round 1 alone and
    # (b) approach the oracle-detection accuracy.
    import jax

    from conan_slam_tpu.graph.frontend import ClosureConfig, relax_trajectory

    rng = np.random.default_rng(3)
    # A figure-eight-ish tour revisiting the origin region several times.
    t_steps = 4000
    ang = np.linspace(0, 4 * np.pi, t_steps)
    xy = np.stack([600 * np.sin(ang), 300 * np.sin(2 * ang)], axis=1)
    th = np.arctan2(*np.gradient(xy, axis=0).T[::-1])
    truth = jnp.asarray(
        np.concatenate([xy, th[:, None]], axis=1).astype(np.float32)
    )
    valid = jnp.ones((t_steps,), bool)
    # Drifted estimate: truth + a large smooth drift (beyond the detection
    # radius over the second half).
    drift = np.cumsum(rng.normal(size=(t_steps, 3)) *
                      [1.2, 1.2, 0.0004], axis=0)
    est = jnp.asarray((np.asarray(truth) + drift).astype(np.float32))

    cfg = ClosureConfig(keyframe_stride=20, radius=40.0, min_index_gap=15,
                        max_closures=512, odo_sigma_xy=0.3,
                        odo_sigma_th=0.005)
    key = jax.random.PRNGKey(0)

    g1, g1_opt = relax_trajectory(
        est, truth, valid, cfg, key, iterations=12,
        rounds=1, detect_on_estimate=True,
    )
    g3, g3_opt = relax_trajectory(
        est, truth, valid, cfg, key, iterations=12,
        rounds=3, detect_on_estimate=True,
    )
    go, go_opt = relax_trajectory(
        est, truth, valid, cfg, key, iterations=12, rounds=1,
    )
    n = g1.nodes.shape[0]
    ncl1 = int(np.asarray(g1.edge_mask)[n - 1:].sum())
    ncl3 = int(np.asarray(g3.edge_mask)[n - 1:].sum())
    nclo = int(np.asarray(go.edge_mask)[n - 1:].sum())
    assert ncl3 > ncl1, (ncl1, ncl3)

    from conan_slam_tpu.runner import metrics

    kf_true = np.asarray(truth)[::cfg.keyframe_stride][:n]
    kf_valid = np.asarray(valid)[::cfg.keyframe_stride][:n]

    def ate(nodes):
        return float(metrics.aligned_ate_rmse(
            jnp.asarray(kf_true), nodes, jnp.asarray(kf_valid)))

    a1, a3, ao = ate(g1_opt.nodes), ate(g3_opt.nodes), ate(go_opt.nodes)
    assert a3 < a1, (a1, a3)
    assert a3 < 1.5 * ao + 0.5, (a3, ao)
