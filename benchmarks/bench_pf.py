"""Particle-filter throughput benchmark (BASELINE.json config 3).

Measures particles/s/chip for the vmapped FastSLAM 2.0 ensemble on the
canonical valet world at 1k particles (and a sweep).  Run on TPU:
    python benchmarks/bench_pf.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(ensembles=(100, 1000, 10000, 100000)):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.runner.loop import run_pf_slam
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.sim.world import default_world

    world = default_world()
    steps = 1200
    log(f"devices: {jax.devices()}")
    results = {}
    for n_particles in ensembles:
        cfg = SlamConfig(num_particles=n_particles)
        t0 = time.time()
        carry, outs = run_pf_slam(world, cfg, jax.random.PRNGKey(0), n_steps=steps)
        np.asarray(outs.x_est)
        log(f"N={n_particles}: compile+run {time.time() - t0:.1f}s")
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            carry, outs = run_pf_slam(
                world, cfg, jax.random.PRNGKey(i + 1), n_steps=steps
            )
            np.asarray(outs.x_est)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        ate = float(metrics.ate_rmse(outs.x_true, outs.x_est, ~outs.done))
        print(
            f"N={n_particles:6d}: {steps / best:8.0f} steps/s  "
            f"{n_particles * steps / best:12.3e} particle-steps/s  ATE={ate:.3f}",
            flush=True,
        )
        results[n_particles] = {
            "steps_per_s": round(steps / best, 1),
            "particle_steps_per_s": round(n_particles * steps / best, 1),
            "ate_m": round(ate, 4),
        }
    return results


if __name__ == "__main__":
    main()
