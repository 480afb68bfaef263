"""BASELINE.json config 4: long valet loop, 5k landmarks, loop closure +
pose-graph relaxation.

The vehicle drives the valet waypoint tour repeatedly (``--loops``) through a
5,000-landmark world (joint state D = 10,003 -> padded 10,240; dense P is
~420 MB in HBM), mapping from scratch WITHOUT the heading pseudo-observation
so heading drift accumulates over the ~20 km tour — the regime loop closure
exists for.  (Two unanchored loops diverge the EKF outright: heading variance
grows without bound and linearisation breaks — the pose-graph stage is the
principled fix, matching BASELINE config 4's intent.)  After the filter run, keyframes + revisit detection + SE(2)
pose-graph relaxation (graph.frontend / graph.pose_graph) correct the
trajectory; reports steps/s and ATE before/after relaxation.

Run on TPU: python benchmarks/bench_longloop.py [--steps N] [--loops L]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_LANDMARKS = 5000
SEED = 11


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=28_000)
    ap.add_argument("--loops", type=int, default=1)
    ap.add_argument("--landmarks", type=int, default=N_LANDMARKS)
    ap.add_argument("--heading-sigma-deg", type=float, default=0.0,
                    help="degraded heading observation; 0 = heading off")
    args = ap.parse_args()

    import jax

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.graph.frontend import ClosureConfig, relax_trajectory
    from conan_slam_tpu.graph.pose_graph import graph_error
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed
    from conan_slam_tpu.sim.world import default_world, random_world

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    n_lm = args.landmarks
    world = random_world(jax.random.PRNGKey(SEED), n_lm)
    # Valet tour that RETURNS HOME (origin appended): the end-of-course
    # revisit is what loop-closure detection needs within a single loop.
    wp = jnp.concatenate(
        [default_world().waypoints, jnp.zeros((1, 2), jnp.float32)]
    )
    world = world._replace(waypoints=wp)

    import math
    hs = args.heading_sigma_deg
    cfg = SlamConfig(
        max_landmarks=n_lm,
        max_obs=64,
        number_loops=args.loops,
        switch_heading_known=hs > 0.0,  # degraded or absent heading sensing
        sigma_heading=(hs if hs > 0 else 0.01) * math.pi / 180.0,
    )
    log(f"devices: {jax.devices()}; D={3 + 2 * n_lm} "
        f"(P ~{(3 + 2 * n_lm)**2 * 4 / 2**30:.2f} GiB unpadded)")

    t0 = time.time()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(0), n_steps=args.steps
    )
    np.asarray(outs.x_est)
    log(f"compile+first run: {time.time() - t0:.1f}s")

    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(1), n_steps=args.steps
    )
    np.asarray(outs.x_est)
    wall = time.perf_counter() - t0

    valid = ~np.asarray(outs.done)
    ate_raw = float(metrics.ate_rmse(outs.x_true, outs.x_est, ~outs.done))

    t0 = time.perf_counter()
    g, g_opt = relax_trajectory(
        outs.x_est, outs.x_true, ~outs.done, ClosureConfig(),
        jax.random.PRNGKey(2),
    )
    nodes = np.asarray(g_opt.nodes)
    relax_wall = time.perf_counter() - t0

    # ATE of the relaxed keyframe trajectory vs truth at the keyframes.
    stride = ClosureConfig().keyframe_stride
    kf_truth = np.asarray(outs.x_true)[::stride][: nodes.shape[0]]
    kf_valid = valid[::stride][: nodes.shape[0]] & np.asarray(g_opt.node_mask)
    err = nodes[kf_valid, :2] - kf_truth[kf_valid, :2]
    ate_relaxed = float(np.sqrt((err**2).sum(axis=1).mean()))

    print(
        f"longloop {n_lm}lm: {args.steps / wall:,.0f} steps/s "
        f"(filter {wall:.2f}s + relax {relax_wall:.2f}s), "
        f"mapped={int(state.n_active)}, "
        f"ATE raw={ate_raw:.2f} m -> relaxed={ate_relaxed:.2f} m, "
        f"chi2 {float(graph_error(g)):.1f} -> {float(graph_error(g_opt)):.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
