"""TPU compile smoke gate — run before every milestone commit.

Round 1 shipped a whole-frame kernel validated only in interpret mode (which
cannot see Mosaic VMEM limits) and broke the headline bench with a
17.99M > 16M scoped-vmem OOM at compile time.  This gate closes that hole:

  stage "kernel"  (~1 min warm): jit-compiles AND runs the production
      megakernel ``frame_update_obs`` at the exact bench shape
      (D=2304, NZ=64, NB=24) on the real backend, then checks the outputs
      against the host-glue jnp path compiled on the same backend.
  stage "program" (~minutes cold, cached after): compiles + runs a 10-step
      ``run_ekf_slam_precomputed`` at the full bench configuration — the
      same scan body bench.py compiles, so any kernel in the product path
      that stops lowering fails HERE, not in BENCH_r{N}.json.
  stage "ate" (~6 s warm): the FULL-length bench run with ATE and
      covariance-symmetry assertions — catches compounding per-frame error
      (the round-2 asymmetry-feedback divergence) that per-frame and
      short-program checks cannot see.

Also asserts the shared VMEM-feasibility predicate ``can_fuse_frame`` says
yes at the bench shape and no at a deliberately oversized one (so an
oversized state silently degrades to the multi-op path instead of OOMing).

Run: python benchmarks/smoke_compile.py [kernel|program|all]   (default all)
Exit code 0 = gate passed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_kernel() -> None:
    import jax
    import jax.numpy as jnp

    from conan_slam_tpu.filters import ekf as ekf_mod
    from conan_slam_tpu.filters.common import CompactObs
    from conan_slam_tpu.filters.ekf.update import fused_frame_update
    from conan_slam_tpu.ops.frame_kernel import can_fuse_frame, frame_update_obs

    d = int(os.environ.get("SMOKE_D", 2304))
    nz = int(os.environ.get("SMOKE_NZ", 64))
    nb = int(os.environ.get("SMOKE_NB", 24))
    assert can_fuse_frame(d, nz, nb), "bench shape must take the megakernel"
    assert not can_fuse_frame(6400, nz, nb), (
        "oversized states must fall back, not OOM"
    )

    rng = np.random.default_rng(11)
    cap = (d - 3) // 2
    lm = rng.uniform(-80, 80, size=(cap, 2)).astype(np.float32)
    state = ekf_mod.init_state_with_map(lm, sigma0=0.5, pad_multiple=128)
    assert state.x.shape[0] == d, state.x.shape
    a = rng.normal(size=(d, 8)).astype(np.float32) * 0.05
    state = state._replace(p=state.p + jnp.asarray(a @ a.T))

    ids = rng.choice(cap, size=nz, replace=False).astype(np.int32)
    z = np.stack(
        [
            np.hypot(lm[ids, 0], lm[ids, 1]) + rng.normal(size=nz) * 0.1,
            np.arctan2(lm[ids, 1], lm[ids, 0]) + rng.normal(size=nz) * 0.01,
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.ones(nz, bool)
    mask[-3] = False
    obs = CompactObs(z=jnp.asarray(z), ids=jnp.asarray(ids), mask=jnp.asarray(mask))
    slots = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)
    r_cov = jnp.asarray([[0.01, 0.0], [0.0, (0.5 * np.pi / 180) ** 2]], jnp.float32)
    b = rng.normal(size=(nb, nb)).astype(np.float32) * 0.1
    bmat = jnp.asarray(0.5 * (b + b.T))
    vtf = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32) * 0.01)

    safe = np.clip(ids, 0, cap - 1)
    rows = np.concatenate(
        [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
    ).astype(np.int32)

    t0 = time.perf_counter()
    fn = jax.jit(
        lambda p, x, r, zr, zb, m, rc, bm, vt: frame_update_obs(
            p, x, r, zr, zb, m, rc, bm, vt
        )
    )
    out = fn(
        state.p, state.x, jnp.asarray(rows), obs.z[:, 0], obs.z[:, 1],
        mask_j, r_cov, bmat, vtf,
    )
    got_p = np.asarray(out.p)       # honest fence on the axon backend
    got_x = np.asarray(out.x)
    got_nis = float(np.asarray(out.nis))
    log(f"kernel compile+run: {time.perf_counter() - t0:.1f}s")

    ref_fn = jax.jit(
        lambda st: fused_frame_update(
            st, None, bmat, obs, slots, mask_j, r_cov,
            use_pallas=False, return_nis=True, vtf=vtf,
        )
    )
    ref_state, _ = ref_fn(state)
    ref_p = np.asarray(ref_state.p)
    ref_x = np.asarray(ref_state.x)
    perr = np.max(np.abs(got_p - ref_p)) / max(np.max(np.abs(ref_p)), 1e-9)
    xerr = np.max(np.abs(got_x - ref_x))
    log(f"kernel vs host-glue: relP={perr:.2e} maxX={xerr:.2e} nis={got_nis:.3f}")
    assert perr < 1e-3, perr
    assert xerr < 1e-3, xerr
    assert np.isfinite(got_nis) and got_nis > 0, got_nis
    log("stage kernel: PASS")


def stage_program() -> None:
    import jax

    import bench as bench_mod
    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.filters.ekf import init_state_with_map
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed

    _, _, world = bench_mod.build_world()
    cfg = SlamConfig(max_landmarks=bench_mod.N_LANDMARKS, max_obs=64)
    state0 = init_state_with_map(world.landmarks, sigma0=bench_mod.SIGMA0)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, key, n_steps=10, init_state=state0
    )
    np.asarray(outs.x_est)
    np.asarray(state.x)
    log(f"program compile+run (10 steps): {time.perf_counter() - t0:.1f}s")
    assert np.all(np.isfinite(np.asarray(state.x)))
    log("stage program: PASS")


def stage_ate() -> None:
    """Long-horizon accuracy gate: the full 9600-step bench run must track.

    The round-2 regression this catches: the megakernel's sweep inverse fed
    covariance asymmetry back with ~1%/frame gain — per-frame outputs matched
    the reference to 5e-5 (stage kernel PASSED) and 10 steps were finite
    (stage program PASSED), yet the filter diverged at frame ~1582.  Only a
    full-length run sees compounding-error failures.  ~6 s warm via the
    persistent cache; ~2 min cold.
    """
    import jax

    import bench as bench_mod
    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.filters.ekf import init_state_with_map
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed

    _, _, world = bench_mod.build_world()
    cfg = SlamConfig(max_landmarks=bench_mod.N_LANDMARKS, max_obs=64)
    state0 = init_state_with_map(world.landmarks, sigma0=bench_mod.SIGMA0)
    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(0), n_steps=bench_mod.BENCH_STEPS,
        init_state=state0,
    )
    ate = float(metrics.ate_rmse(np.asarray(outs.x_est), np.asarray(outs.x_true)))
    p = np.asarray(state.p)
    asym = float(np.abs(p - p.T).max())
    log(
        f"ate stage ({bench_mod.BENCH_STEPS} steps, "
        f"{time.perf_counter() - t0:.1f}s): ATE={ate:.4f} m, asym(P)={asym:.2e}"
    )
    assert ate < 0.05, f"long-horizon ATE {ate} — filter diverges/degrades"
    assert asym < 1e-4, f"covariance asymmetry {asym} — update not symmetric"
    log("stage ate: PASS")


def stage_gated() -> None:
    """The gated-association product program (bench_gated config: 500-lm
    world, empty map, gating kernel + factor kernel + megakernel) must lower,
    run AND hold a multi-thousand-step accuracy bound.

    The length matters: a 60-step version of this stage PASSED while a
    precision regression (split-tier panels in the gated kernels, round 4)
    was corrupting association into an 11 m ATE over the full tour —
    association errors need thousands of steps to compound visibly.  3,000
    steps catches that failure class at ~0.1 s device time (the canonical
    run's ATE at this horizon is ~0.1 m; the corrupted run was > 1 m)."""
    import jax
    import jax.numpy as jnp

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed
    from conan_slam_tpu.sim.world import default_world, random_world

    world = random_world(jax.random.PRNGKey(7), 500)._replace(
        waypoints=default_world().waypoints
    )
    cfg = SlamConfig(max_landmarks=500, max_obs=64,
                     switch_association_known=False)
    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(0), n_steps=3000
    )
    ate = float(metrics.ate_rmse(outs.x_true, outs.x_est, ~outs.done))
    log(f"gated compile+run (3000 steps): {time.perf_counter() - t0:.1f}s, "
        f"ATE={ate:.3f} m, mapped={int(state.n_active)}")
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert int(state.n_active) > 0, "gated program must map landmarks"
    assert ate < 1.0, f"gated ATE {ate} — association corrupting"
    log("stage gated: PASS")


def stage_gated_full() -> None:
    """FULL-LENGTH gated regression canary (VERDICT r4 gap 3): the entire
    25,000-step config-2 tour with stored accuracy/mapping bounds.

    This is the tripwire for the recorded round-4 failure class: split-tier
    panels in the gated kernels pass every shorter stage (including the
    3,000-step "gated" stage) and only corrupt association over the full
    tour (ATE 0.152 -> 11.4 m, mapped 302 -> 274).  Canonical full-course
    values: ATE ~= 0.15 m, mapped ~= 302/500; the bounds below fail the
    stage when FK_PANEL_PRECISION_SAFE=split4 is forced (verified) while
    passing the fp32-contract default with wide margin.  ~1 s device time;
    the program is the same one bench_gated.py compiles (warm via
    .jax_bench_cache)."""
    import jax

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.runner import metrics
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed
    from conan_slam_tpu.sim.world import default_world, random_world

    world = random_world(jax.random.PRNGKey(7), 500)._replace(
        waypoints=default_world().waypoints
    )
    cfg = SlamConfig(max_landmarks=500, max_obs=64,
                     switch_association_known=False)
    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(0), n_steps=25_000
    )
    ate = float(metrics.ate_rmse(outs.x_true, outs.x_est, ~outs.done))
    mapped = int(state.n_active)
    log(f"gated_full compile+run (25k steps): {time.perf_counter() - t0:.1f}s, "
        f"ATE={ate:.3f} m, mapped={mapped}")
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert ate < 0.5, (
        f"gated full-course ATE {ate:.3f} m (bound 0.5; canonical ~0.15) — "
        "association corrupting over the long horizon"
    )
    assert 270 <= mapped <= 340, (
        f"gated full-course mapped count {mapped} outside stored bounds "
        "[270, 340] (canonical ~302) — association/augment regression"
    )
    log("stage gated_full: PASS")


def stage_longloop() -> None:
    """The 5k-landmark program (D = 10,240): asserts the resident megakernel
    schedules correctly refuse this shape while the big-D streaming pair
    engages, and that the program lowers and runs."""
    import jax
    import jax.numpy as jnp

    from conan_slam_tpu.ops.frame_kernel import (
        _pick_bigchain_tile,
        _pick_framestep_tile,
        _round_up,
        can_fuse_frame,
        can_fuse_frame_step,
    )
    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.runner.loop import run_ekf_slam_precomputed
    from conan_slam_tpu.sim.world import default_world, random_world

    d = 3 + 2 * 5000
    d_pad = ((d + 255) // 256) * 256
    mp, rp = _round_up(128, 128), _round_up(131, 8)
    assert _pick_framestep_tile(d_pad, mp, rp) == 0, "resident must refuse"
    assert _pick_bigchain_tile(d_pad, mp, rp) > 0, "streaming must engage"
    assert can_fuse_frame_step(d_pad, 64)
    assert not can_fuse_frame(d_pad, 64, 24), "gated megakernel must refuse"
    world = random_world(jax.random.PRNGKey(11), 5000)._replace(
        waypoints=default_world().waypoints
    )
    cfg = SlamConfig(max_landmarks=5000, max_obs=64)
    t0 = time.perf_counter()
    state, outs = run_ekf_slam_precomputed(
        world, cfg, jax.random.PRNGKey(0), n_steps=24
    )
    np.asarray(outs.x_est)
    log(f"longloop compile+run (24 steps, D={d_pad}): "
        f"{time.perf_counter() - t0:.1f}s")
    assert np.all(np.isfinite(np.asarray(state.x)))
    log("stage longloop: PASS")


def stage_pf() -> None:
    """The FastSLAM product program at the reference config (100 particles)."""
    import jax

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.runner.loop import run_pf_slam
    from conan_slam_tpu.sim.world import default_world

    t0 = time.perf_counter()
    carry, outs = run_pf_slam(
        default_world(), SlamConfig(num_particles=100), jax.random.PRNGKey(0),
        n_steps=24,
    )
    np.asarray(outs.x_est)
    log(f"pf compile+run (24 steps): {time.perf_counter() - t0:.1f}s")
    assert np.all(np.isfinite(np.asarray(outs.x_est)))
    log("stage pf: PASS")


_STAGES = {
    "kernel": stage_kernel,
    "program": stage_program,
    "ate": stage_ate,
    "gated": stage_gated,
    "gated_full": stage_gated_full,
    "longloop": stage_longloop,
    "pf": stage_pf,
}


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    which = sys.argv[1:] or ["all"]
    log(f"devices: {jax.devices()}")
    names = list(_STAGES) if which == ["all"] else which
    for name in names:
        _STAGES[name]()
    log(f"smoke_compile: {'ALL ' if which == ['all'] else ''}PASS "
        f"({', '.join(names)})")


if __name__ == "__main__":
    main()
