"""Frame-step time breakdown at bench scale (D = 2051).

Runs variants of the fused EKF observation-frame step as chained scans and
reports per-frame time, isolating:

  full       - the real fused frame step (bench.py workload body)
  factors    - frame_factors + rank update only (no measurement chain)
  ppass      - one fused P rank-update/downdate pass only
  smallchain - the measurement small chain (operator build, P H^T,
               cholesky + triangular inverse, gain matvecs), P held fixed
  chol       - cholesky + triangular inverse of the (2*NZ, 2*NZ) S alone

Run on TPU: python benchmarks/bench_framestep.py [modes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_LANDMARKS = int(os.environ.get("FS_LANDMARKS", "1024"))
BENCH_STEPS = int(os.environ.get("FS_STEPS", "2400"))
SEED = 42
SIGMA0 = 1.0


def main(modes):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import build_world, WORLD_EXTENT

    from conan_slam_tpu.config import SlamConfig
    from conan_slam_tpu.core.linalg import PRECISION, safe_cholesky, sym
    from conan_slam_tpu.filters import ekf as ekf_mod
    from conan_slam_tpu.filters.ekf.observe import build_batch_operator
    from conan_slam_tpu.ops.pallas_update import rank_update_t
    from conan_slam_tpu.runner.loop import make_noise, run_ekf_slam_precomputed
    from conan_slam_tpu.sim import sensor_sim
    from conan_slam_tpu.sim.precompute import rollout_truth
    from conan_slam_tpu.filters.common import compact

    print("devices:", jax.devices(), file=sys.stderr)
    lm, wp, world = build_world()
    if N_LANDMARKS != lm.shape[0]:
        # Non-default shapes (e.g. the longloop D) get a random world of the
        # requested size on the same waypoint tour.
        rngw = np.random.default_rng(SEED)
        lm = rngw.uniform(-WORLD_EXTENT, WORLD_EXTENT,
                          size=(N_LANDMARKS, 2)).astype(np.float32)
        world = world._replace(landmarks=jnp.asarray(lm))
    cfg = SlamConfig(max_landmarks=N_LANDMARKS, max_obs=64,
                     enable_augment=False)
    noise = make_noise(cfg, "ekf")
    state0 = ekf_mod.init_state_with_map(world.landmarks, sigma0=SIGMA0)
    key = jax.random.PRNGKey(SEED)
    interval = cfg.observe_interval
    n_steps = ((BENCH_STEPS + interval - 1) // interval) * interval
    n_frames = n_steps // interval
    nz = min(world.num_landmarks, cfg.max_observations())

    roll = rollout_truth(np.asarray(world.waypoints), cfg, n_steps)
    k_ctrl, k_obs = jax.random.split(key)
    ctrl_noise = jax.random.normal(k_ctrl, (n_frames, interval, 2), jnp.float32)
    obs_noise = jax.random.normal(
        k_obs, (n_frames, world.num_landmarks, 2), jnp.float32
    )
    frames = (
        jnp.asarray(roll.x_true).reshape(n_frames, interval, 3),
        jnp.asarray(roll.swa).reshape(n_frames, interval),
        jnp.asarray(roll.active).reshape(n_frames, interval),
        jnp.asarray(roll.done).reshape(n_frames, interval),
        ctrl_noise,
        obs_noise,
    )

    def frame_inputs(frame):
        x_true_f, swa_f, active_f, done_f, ctrl_noise_f, obs_noise_f = frame
        vns = cfg.velocity + ctrl_noise_f[:, 0] * cfg.sigma_v
        swans = swa_f + ctrl_noise_f[:, 1] * cfg.sigma_swa
        return x_true_f, vns, swans, active_f, done_f, obs_noise_f

    def get_obs(x_true_end, obs_noise_f):
        obs_full = sensor_sim.get_observations(x_true_end, world.landmarks, cfg.max_range)
        scale = jnp.asarray([cfg.sigma_r, cfg.sigma_b], obs_full.z.dtype)
        obs_full = obs_full._replace(z=obs_full.z + obs_noise_f * scale)
        return compact(obs_full, nz)

    def factors_step(state, frame):
        x_true_f, vns, swans, active_f, done_f, _ = frame_inputs(frame)
        state, pose_trace, vmat, bmat = ekf_mod.frame_factors(
            state, vns, swans, x_true_f[:, 2], active_f,
            noise.qe, cfg.wheel_base, cfg.dt_controls, cfg.sigma_heading,
            cfg.switch_heading_known,
        )
        p = rank_update_t(state.p, vmat.T, bmat)
        return state._replace(p=p), pose_trace[-1]

    def ppass_step(carry, frame):
        state, vt, bmat = carry
        p = rank_update_t(state.p, vt, bmat)
        return (state._replace(p=p), vt, bmat), p[0, 0]

    def smallchain_step(state, frame):
        x_true_f, vns, swans, active_f, done_f, obs_noise_f = frame_inputs(frame)
        obs = get_obs(x_true_f[-1], obs_noise_f)
        assoc = ekf_mod.associate_known(state, obs)
        mask = jnp.logical_and(assoc.known_mask, jnp.logical_not(done_f[-1]))
        v, h, rr = build_batch_operator(state, obs, assoc.slots, mask, noise.re)
        ht = h.T
        pht = jnp.matmul(state.p, ht, precision=PRECISION)
        s = sym(jnp.matmul(h, pht, precision=PRECISION) + rr)
        chol = safe_cholesky(s)
        eye_m = jnp.eye(s.shape[0], dtype=s.dtype)
        import jax.scipy.linalg as jsl
        linv = jsl.solve_triangular(chol, eye_m, lower=True)
        w1t = jnp.matmul(linv, pht.T, precision=PRECISION)
        lv = linv @ v
        x = state.x + 1e-20 * (w1t.T @ lv)
        return state._replace(x=x), x[0]

    def make_mega_inputs():
        import jax.numpy as jnp
        d = state0.x.shape[0]
        nb = 20
        mp = -(-2 * nz // 128) * 128
        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        hc = jnp.asarray(rng.normal(size=(mp, 3 + 2 * nz)).astype(np.float32) * 0.1)
        bmat = jnp.eye(nb, dtype=jnp.float32) * 1e-6
        vtf = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32) * 1e-4)
        rmat = jnp.eye(mp, dtype=jnp.float32)
        vpad = jnp.zeros((mp,), jnp.float32)
        return rows131, hc, bmat, vtf, rmat, vpad

    def gather_step(carry, _):
        import jax.numpy as jnp
        state, rows131, hc, bmat, vtf, rmat, vpad = carry
        prows = state.p[rows131]
        state = state._replace(x=state.x + 1e-20 * prows[0])
        return (state, rows131, hc, bmat, vtf, rmat, vpad), prows[0, 0]

    def noop_step(carry, _):
        s, acc = carry
        acc = acc + s[0, 0] * 1e-12
        s = s * (1.0 + 1e-12 * acc)
        return (s, acc), acc

    def sweep_step(carry, _):
        from conan_slam_tpu.ops.spd_inverse import spd_inverse
        s, acc = carry
        si = spd_inverse(s)
        acc = acc + si[0, 0]
        s = s + 1e-12 * acc * jnp.eye(s.shape[0], dtype=s.dtype)
        return (s, acc), acc

    def chol_step(carry, _):
        s, acc = carry
        import jax.scipy.linalg as jsl
        chol = safe_cholesky(s)
        eye_m = jnp.eye(s.shape[0], dtype=s.dtype)
        linv = jsl.solve_triangular(chol, eye_m, lower=True)
        acc = acc + linv[0, 0]
        s = s + 1e-12 * acc * jnp.eye(s.shape[0], dtype=s.dtype)
        return (s, acc), acc

    def run_scan(step, carry0, xs):
        @jax.jit
        def run(carry0, xs):
            with jax.default_matmul_precision("highest"):
                return jax.lax.scan(step, carry0, xs)
        return run

    def timeit(name, fn, *args):
        # Fence on the SMALLEST output leaf: fetching a large leaf (e.g. the
        # carried (D, D) covariance) pays a ~multi-hundred-us/iteration
        # device->host transfer over the remote tunnel and poisons the
        # measurement.
        def fence(out):
            leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "size")]
            np.asarray(min(leaves, key=lambda l: l.size))

        out = fn(*args)
        jax.block_until_ready(out)
        fence(out)                      # warm + honest fence
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            fence(out)
            ts.append(time.perf_counter() - t0)
        per_frame = min(ts) / n_frames
        print(f"{name:11s}: {per_frame * 1e6:9.1f} us/frame "
              f"({min(ts):.3f}s / {n_frames} frames)", flush=True)

    rng = np.random.default_rng(0)
    d = state0.x.shape[0]

    if "fullpair" in modes:
        # The real precomputed driver with two-frame fusion on.
        cfg_p = cfg.replace(frame_pair=True)
        st_p = ekf_mod.init_state_with_map(world.landmarks, sigma0=SIGMA0)

        def fullpair(key):
            state, outs = run_ekf_slam_precomputed(
                world, cfg_p, key, n_steps=BENCH_STEPS, init_state=st_p
            )
            return outs.x_est
        timeit("fullpair", fullpair, key)

    for mode in modes:
        if not (mode == "full" or mode.startswith("full_u")):
            continue
        unroll = int(mode[6:]) if mode.startswith("full_u") else cfg.scan_unroll
        cfg_u = cfg.replace(scan_unroll=unroll)
        st_u = ekf_mod.init_state_with_map(world.landmarks, sigma0=SIGMA0)

        def full(key, cfg_u=cfg_u, st_u=st_u):
            state, outs = run_ekf_slam_precomputed(
                world, cfg_u, key, n_steps=BENCH_STEPS, init_state=st_u
            )
            return outs.x_est
        timeit(mode, full, key)

    if "factors" in modes:
        timeit("factors", run_scan(factors_step, state0, frames), state0, frames)

    if "ppass" in modes:
        r = int(os.environ.get("FS_RANK", "152"))  # fused-frame rank (MP + factors)
        vt = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32) * 1e-4)
        bmat = jnp.eye(r, dtype=jnp.float32) * 1e-6
        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit("ppass", run_scan(ppass_step, (state0, vt, bmat), dummy),
               (state0, vt, bmat), dummy)

    if "smallchain" in modes:
        timeit("smallchain", run_scan(smallchain_step, state0, frames), state0, frames)

    if "gather" in modes:
        carry0 = (state0,) + make_mega_inputs()
        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit("gather", run_scan(gather_step, carry0, dummy), carry0, dummy)

    if "fullkernel" in modes:
        # The production whole-frame megakernel (frame_update_obs) alone,
        # P carried frame to frame, fixed measurement inputs.
        from conan_slam_tpu.ops.frame_kernel import frame_update_obs

        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        nb = 8
        bmat = jnp.eye(nb, dtype=jnp.float32) * 1e-8
        vtf = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32) * 1e-4)
        zr = jnp.asarray(
            np.hypot(lm[:nz, 0], lm[:nz, 1]).astype(np.float32)
        )
        zb = jnp.asarray(
            np.arctan2(lm[:nz, 1], lm[:nz, 0]).astype(np.float32)
        )
        mask = jnp.ones((nz,), bool)
        r_cov = jnp.asarray(noise.re)

        def fullkernel_step(carry, _):
            p, x = carry
            fu = frame_update_obs(
                p, x, rows131, zr, zb, mask, r_cov, bmat, vtf
            )
            return (fu.p, fu.x), fu.nis

        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit(
            "fullkernel",
            run_scan(fullkernel_step, (state0.p, state0.x), dummy),
            (state0.p, state0.x), dummy,
        )

    if "stepkernel" in modes:
        # The production whole-frame-step kernel (frame_step) alone: fixed
        # measurement/control inputs, P and x carried frame to frame.
        from conan_slam_tpu.ops.frame_kernel import frame_step

        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        zr = jnp.asarray(np.hypot(lm[:nz, 0], lm[:nz, 1]).astype(np.float32))
        zb = jnp.asarray(np.arctan2(lm[:nz, 1], lm[:nz, 0]).astype(np.float32))
        # FS_NVALID bounds the valid measurements (the serial sweep scales
        # with the LAST valid index; production frames run ~40 of 64).
        nvalid = int(os.environ.get("FS_NVALID", str(nz)))
        mask = jnp.asarray(np.arange(nz) < nvalid)
        r_cov = jnp.asarray(noise.re)
        s = interval
        vns_f = jnp.full((s,), cfg.velocity, jnp.float32)
        swans_f = jnp.zeros((s,), jnp.float32)
        phis_f = jnp.zeros((s,), jnp.float32)
        actives_f = jnp.ones((s,), bool)

        def stepkernel_step(carry, _):
            p, x = carry
            fs = frame_step(
                p, x, rows131, vns_f, swans_f, phis_f, actives_f,
                jnp.asarray(noise.qe), zr, zb, mask, r_cov,
                cfg.wheel_base, cfg.dt_controls, cfg.sigma_heading, True,
            )
            return (fs.p, fs.x), fs.nis

        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit(
            "stepkernel",
            run_scan(stepkernel_step, (state0.p, state0.x), dummy),
            (state0.p, state0.x), dummy,
        )

    if "stepkernel_big" in modes:
        # The streaming two-dispatch schedule (chain kernel + rank pass)
        # forced at the bench shape — quantifies what the resident schedule
        # buys, and the cost floor of the pair-fusion building blocks.
        from conan_slam_tpu.ops.frame_kernel import frame_step

        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        zr = jnp.asarray(np.hypot(lm[:nz, 0], lm[:nz, 1]).astype(np.float32))
        zb = jnp.asarray(np.arctan2(lm[:nz, 1], lm[:nz, 0]).astype(np.float32))
        mask = jnp.ones((nz,), bool)
        r_cov = jnp.asarray(noise.re)
        s = interval
        vns_f = jnp.full((s,), cfg.velocity, jnp.float32)
        swans_f = jnp.zeros((s,), jnp.float32)
        phis_f = jnp.zeros((s,), jnp.float32)
        actives_f = jnp.ones((s,), bool)

        def stepkernel_big_step(carry, _):
            p, x = carry
            fs = frame_step(
                p, x, rows131, vns_f, swans_f, phis_f, actives_f,
                jnp.asarray(noise.qe), zr, zb, mask, r_cov,
                cfg.wheel_base, cfg.dt_controls, cfg.sigma_heading, True,
                _force_schedule="big",
            )
            return (fs.p, fs.x), fs.nis

        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit(
            "stepkernel_big",
            run_scan(stepkernel_big_step, (state0.p, state0.x), dummy),
            (state0.p, state0.x), dummy,
        )

    if any(m in modes for m in ("chainkernel", "chainonly", "gmrank")):
        # Isolate the two halves of the big/pair schedule: "chainkernel" =
        # host gathers + one streaming chain dispatch (P fixed, x carried);
        # "gmrank" = G/M assembly + the stacked rank pass (pht fixed).
        from conan_slam_tpu.ops.frame_kernel import (
            _chain_dispatch, _frame_gm, _pack_ctrl, _pack_meas,
            _pick_bigchain_tile, _round_up,
        )
        from conan_slam_tpu.ops.pallas_update import rank_update_t

        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        zr = jnp.asarray(np.hypot(lm[:nz, 0], lm[:nz, 1]).astype(np.float32))
        zb = jnp.asarray(np.arctan2(lm[:nz, 1], lm[:nz, 0]).astype(np.float32))
        mask = jnp.ones((nz,), bool)
        r_cov = jnp.asarray(noise.re)
        sI = interval
        ctrl = (jnp.full((sI,), cfg.velocity, jnp.float32),
                jnp.zeros((sI,), jnp.float32), jnp.zeros((sI,), jnp.float32),
                jnp.ones((sI,), bool))
        mp = _round_up(2 * nz, 128)
        nzl = mp // 2
        rp = _round_up(rows131.shape[0], 8)
        tc = _pick_bigchain_tile(d, mp, rp)
        f32 = jnp.float32
        zin, rsc, nblk = _pack_meas(zr, zb, mask, r_cov, nzl, f32)
        subs, qc = _pack_ctrl(*ctrl, jnp.asarray(noise.qe), f32)
        rows_full = jnp.concatenate(
            [rows131, jnp.zeros((rp - rows131.shape[0],), rows131.dtype)]
        )
        p_fix = state0.p

        if "chainkernel" in modes:
            def chain_step(x, _):
                prows = p_fix[rows_full]
                prc = prows[:, rows_full]
                x0rows = x[rows_full].reshape(1, rp)
                pht, xn, pt, nis, si, k4 = _chain_dispatch(
                    x.reshape(1, d), subs, qc, zin, rsc, nblk, x0rows,
                    prows, prc, tc, mp, rp, sI, cfg.wheel_base,
                    cfg.dt_controls, cfg.sigma_heading, True,
                    False,
                )
                return xn[0], nis[0, 0]

            dummy = jnp.zeros((n_frames,), jnp.float32)
            timeit("chainkernel", run_scan(chain_step, state0.x, dummy),
                   state0.x, dummy)

        if "chainonly" in modes:
            # The chain dispatch with the P row strips FIXED (hoisted out of
            # the scan): kernel + dispatch cost without the per-frame
            # gathers.
            prows_fix = p_fix[rows_full]
            prc_fix = prows_fix[:, rows_full]

            def chainonly_step(x, _):
                x0rows = x[rows_full].reshape(1, rp)
                pht, xn, pt, nis, si, k4 = _chain_dispatch(
                    x.reshape(1, d), subs, qc, zin, rsc, nblk, x0rows,
                    prows_fix, prc_fix, tc, mp, rp, sI, cfg.wheel_base,
                    cfg.dt_controls, cfg.sigma_heading, True,
                    False,
                )
                return xn[0], nis[0, 0]

            dummy = jnp.zeros((n_frames,), jnp.float32)
            timeit("chainonly", run_scan(chainonly_step, state0.x, dummy),
                   state0.x, dummy)

        if "gmrank" in modes:
            pht_fix = jnp.asarray(
                rng.normal(size=(mp, d)).astype(np.float32) * 1e-4
            )
            si_fix = jnp.eye(mp, dtype=f32) * 1e-6
            k4_fix = jnp.zeros((8, 8), f32)

            def gmrank_step(carry, _):
                p = carry
                g, m = _frame_gm(pht_fix, si_fix, k4_fix, p[2:3, :], mp)
                p = rank_update_t(p, g, m)
                return p, p[0, 0]

            dummy = jnp.zeros((n_frames,), jnp.float32)
            timeit("gmrank", run_scan(gmrank_step, state0.p, dummy),
                   state0.p, dummy)

    if "factkernel" in modes:
        # frame_factors_fused alone: the factor recursion kernel + its glue,
        # factors discarded (1e-20-weighted into the carried mean).
        from conan_slam_tpu.ops.factor_kernel import frame_factors_fused

        def factkernel_step(state, frame):
            x_true_f, vns, swans, active_f, done_f, _ = frame_inputs(frame)
            state, pose_trace, vtf, bmat = frame_factors_fused(
                state, vns, swans, x_true_f[:, 2], active_f,
                noise.qe, cfg.wheel_base, cfg.dt_controls, cfg.sigma_heading,
                cfg.switch_heading_known,
            )
            x = state.x + 1e-20 * (bmat[0, 0] * vtf[0])
            return state._replace(x=x), pose_trace[-1]

        timeit("factkernel", run_scan(factkernel_step, state0, frames),
               state0, frames)

    if "glue" in modes:
        # The EXACT precomputed-driver frame body (runner.loop.
        # ekf_precomp_frame_step) with the megakernel call replaced by a
        # cheap touch — measures everything the driver pays per frame
        # OUTSIDE the fused kernel (obs assembly, association, gathers/prep,
        # augment cond, output stacking).
        from conan_slam_tpu.runner.loop import ekf_precomp_frame_step
        import conan_slam_tpu.filters.ekf as ekf_pkg

        real_fused = ekf_pkg.fused_frame_step

        def stub_fused(state, vns, swans, phis, actives, q_cov, obs, slots,
                       mask, r_cov, *args, **kw):
            nis = jnp.sum(vns) * 1e-20 + jnp.sum(jnp.where(mask, obs.z[:, 0], 0.0)) * 1e-20
            x = state.x.at[0].add(nis)
            pt = jnp.zeros((vns.shape[0], 3), jnp.float32) + x[0]
            return state._replace(x=x), pt, nis

        from conan_slam_tpu.sim.precompute import rollout_observations
        obs_roll = rollout_observations(
            roll.x_true, np.asarray(world.landmarks), cfg.max_range, nz, interval
        )
        frames_glue = frames[:4] + (
            frames[4],
            jnp.asarray(obs_roll.z_true),
            jnp.asarray(obs_roll.ids),
            jnp.asarray(obs_roll.mask),
            obs_noise[:, :nz, :],
        )
        ekf_pkg.fused_frame_step = stub_fused
        try:
            def glue_step(state, frame):
                return ekf_precomp_frame_step(state, frame, cfg=cfg,
                                              world=world, noise=noise)
            timeit("glue", run_scan(glue_step, state0, frames_glue),
                   state0, frames_glue)
        finally:
            ekf_pkg.fused_frame_step = real_fused

    if any(m.startswith("body_") for m in modes):
        # Hypothesis probe: the augment lax.cond in the driver body forces a
        # copy of the kernel's P output (the untaken identity branch cannot
        # alias).  body_noaug = exact driver body minus the cond; body_aug =
        # with it.  The difference is the cond's cost on a steady-state run.
        from conan_slam_tpu.sim.precompute import rollout_observations
        obs_roll2 = rollout_observations(
            roll.x_true, np.asarray(world.landmarks), cfg.max_range, nz, interval
        )
        frames_body = frames[:4] + (
            frames[4],
            jnp.asarray(obs_roll2.z_true),
            jnp.asarray(obs_roll2.ids),
            jnp.asarray(obs_roll2.mask),
            obs_noise[:, :nz, :],
        )
        from conan_slam_tpu.filters.common import CompactObs

        def make_body(with_aug):
            def body(state, frame):
                (x_true_f, swa_f, active_f, done_f, ctrl_noise_f,
                 z_true_f, ids_f, zmask_f, obs_noise_f) = frame
                vns = cfg.velocity + ctrl_noise_f[:, 0] * cfg.sigma_v
                swans = swa_f + ctrl_noise_f[:, 1] * cfg.sigma_swa
                z = z_true_f + obs_noise_f * jnp.asarray(
                    [cfg.sigma_r, cfg.sigma_b], z_true_f.dtype)
                obs = CompactObs(z=jnp.where(zmask_f[:, None], z, 0.0),
                                 ids=ids_f, mask=zmask_f)
                live = jnp.logical_not(done_f[-1])
                assoc = ekf_mod.associate_known(state, obs)
                state, pose_trace, frame_nis = ekf_mod.fused_frame_step(
                    state, vns, swans, x_true_f[:, 2], active_f, noise.qe,
                    obs, assoc.slots,
                    jnp.logical_and(assoc.known_mask, live), noise.re,
                    cfg.wheel_base, cfg.dt_controls, cfg.sigma_heading,
                    cfg.switch_heading_known,
                )
                if with_aug == "cond":
                    new_mask = jnp.logical_and(assoc.new_mask, live)
                    state = jax.lax.cond(
                        jnp.any(new_mask),
                        lambda s: ekf_mod.augment(s, obs, new_mask, noise.re),
                        lambda s: s,
                        state,
                    )
                elif with_aug == "uncond":
                    new_mask = jnp.logical_and(assoc.new_mask, live)
                    state = ekf_mod.augment(state, obs, new_mask, noise.re)
                return state, pose_trace[-1]
            return body

        if "body_noaug" in modes:
            timeit("body_noaug", run_scan(make_body(None), state0, frames_body),
                   state0, frames_body)
        if "body_aug" in modes:
            timeit("body_aug", run_scan(make_body("cond"), state0, frames_body),
                   state0, frames_body)
        if "body_uncond" in modes:
            timeit("body_uncond", run_scan(make_body("uncond"), state0,
                                           frames_body),
                   state0, frames_body)

    if any(m.startswith("gbody") for m in modes) or "gating" in modes:
        # Big-D attribution (FS_LANDMARKS=10240): the REAL gated driver body
        # (runner.loop.ekf_precomp_frame_step with
        # switch_association_known=False) on a prebuilt full map, with and
        # without the augment cond — plus the gating kernel alone.
        from conan_slam_tpu.runner.loop import ekf_precomp_frame_step
        from conan_slam_tpu.sim.precompute import rollout_observations

        obs_roll3 = rollout_observations(
            roll.x_true, np.asarray(world.landmarks), cfg.max_range, nz, interval
        )
        frames_g = frames[:4] + (
            frames[4],
            jnp.asarray(obs_roll3.z_true),
            jnp.asarray(obs_roll3.ids),
            jnp.asarray(obs_roll3.mask),
            obs_noise[:, :nz, :],
        )

        def gbody(aug_flag):
            cfg_g = cfg.replace(switch_association_known=False,
                                enable_augment=aug_flag)

            def body(state, frame):
                return ekf_precomp_frame_step(state, frame, cfg=cfg_g,
                                              world=world, noise=noise)
            return body

        if "gbody_aug" in modes:
            timeit("gbody_aug", run_scan(gbody(True), state0, frames_g),
                   state0, frames_g)
        if "gbody_noaug" in modes:
            timeit("gbody_noaug", run_scan(gbody(False), state0, frames_g),
                   state0, frames_g)
        if "gating" in modes:
            def gating_step(state, frame):
                x_true_f, vns, swans, active_f, done_f, obs_noise_f = \
                    frame_inputs(frame[:5] + (frame[8],))
                z = frame[5] + obs_noise_f * jnp.asarray(
                    [cfg.sigma_r, cfg.sigma_b], jnp.float32)
                from conan_slam_tpu.filters.common import CompactObs
                obs = CompactObs(z=jnp.where(frame[7][:, None], z, 0.0),
                                 ids=frame[6], mask=frame[7])
                assoc = ekf_mod.associate_gated(
                    state, obs, noise.re, cfg.gate_reject, cfg.gate_augment,
                )
                x = state.x.at[0].add(1e-20 * jnp.sum(assoc.slots))
                return state._replace(x=x), x[0]

            timeit("gating", run_scan(gating_step, state0, frames_g),
                   state0, frames_g)

    if "assoc" in modes:
        def assoc_step(state, frame):
            x_true_f, vns, swans, active_f, done_f, obs_noise_f = frame_inputs(frame)
            obs = get_obs(x_true_f[-1], obs_noise_f)
            assoc = ekf_mod.associate_known(state, obs)
            x = state.x.at[0].add(1e-20 * jnp.sum(assoc.slots))
            return state._replace(x=x), x[0]

        timeit("assoc", run_scan(assoc_step, state0, frames), state0, frames)

    if "megaprep" in modes:
        # The megakernel branch's host-side prep alone: slot-row indices,
        # P row/submatrix gathers, pads, zin assembly — everything
        # frame_update_obs does before its pallas_call.
        slots = jnp.arange(nz, dtype=jnp.int32)
        rows2 = (3 + 2 * slots[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        rows131 = jnp.concatenate([jnp.arange(3, dtype=jnp.int32), rows2])
        nb = 8
        vtf0 = jnp.asarray(rng.normal(size=(nb, d)).astype(np.float32) * 1e-4)
        zr = jnp.asarray(np.hypot(lm[:nz, 0], lm[:nz, 1]).astype(np.float32))
        zb = jnp.asarray(np.arctan2(lm[:nz, 1], lm[:nz, 0]).astype(np.float32))
        mask = jnp.ones((nz,), bool)

        def megaprep_step(carry, _):
            p, x = carry
            rp = -(-rows131.shape[0] // 8) * 8
            nzl = (-(-2 * nz // 128) * 128) // 2
            nr = rows131.shape[0]
            nbp = -(-nb // 8) * 8
            mask_f = mask.astype(p.dtype)
            zin = jnp.zeros((8, nzl), p.dtype)
            zin = zin.at[0, :nz].set(jnp.where(mask, zr, 0.0))
            zin = zin.at[1, :nz].set(jnp.where(mask, zb, 0.0))
            zin = zin.at[2, :nz].set(mask_f)
            prows_u = p[rows131]
            prows = jnp.pad(prows_u, ((0, rp - nr), (0, 0)))
            prc = jnp.pad(prows_u[:, rows131], ((0, rp - nr), (0, rp - nr)))
            vrows = jnp.pad(vtf0[:, rows131], ((0, nbp - nb), (0, rp - nr)))
            xrows = jnp.pad(x[rows131], (0, rp - nr)).reshape(1, rp)
            acc = (prows[0, 0] + prc[0, 0] + vrows[0, 0] + xrows[0, 0]
                   + zin[0, 0])
            # Single-element in-place touch keeps the gathers loop-carried
            # (not hoisted) without paying a full P rewrite.
            p = p.at[0, 0].add(1e-20 * acc)
            return (p, x), acc

        dummy = jnp.zeros((n_frames,), jnp.float32)
        timeit("megaprep", run_scan(megaprep_step, (state0.p, state0.x), dummy),
               (state0.p, state0.x), dummy)

        def prc_step(carry, _):
            p, x = carry
            prows_u = p[rows131]
            prc = prows_u[:, rows131]          # the lane gather
            acc = prc[0, 0]
            p = p.at[0, 0].add(1e-20 * acc)
            return (p, x), acc

        timeit("prep_prc", run_scan(prc_step, (state0.p, state0.x), dummy),
               (state0.p, state0.x), dummy)

        def pads_step(carry, _):
            p, x = carry
            rp = -(-rows131.shape[0] // 8) * 8
            nr = rows131.shape[0]
            prows_u = p[rows131]
            prows = jnp.pad(prows_u, ((0, rp - nr), (0, 0)))
            acc = prows[0, 0]
            p = p.at[0, 0].add(1e-20 * acc)
            return (p, x), acc

        timeit("prep_pads", run_scan(pads_step, (state0.p, state0.x), dummy),
               (state0.p, state0.x), dummy)

        def zin_step(carry, _):
            p, x = carry
            nzl = (-(-2 * nz // 128) * 128) // 2
            mask_f = mask.astype(p.dtype)
            zin = jnp.zeros((8, nzl), p.dtype)
            zin = zin.at[0, :nz].set(jnp.where(mask, zr, 0.0))
            zin = zin.at[1, :nz].set(jnp.where(mask, zb, 0.0))
            zin = zin.at[2, :nz].set(mask_f)
            acc = zin[0, 0]
            p = p.at[0, 0].add(1e-20 * acc)
            return (p, x), acc

        timeit("prep_zin", run_scan(zin_step, (state0.p, state0.x), dummy),
               (state0.p, state0.x), dummy)

    if "sweeponly" in modes:
        # The in-kernel serial sweep (_sweep_si) alone on a (MP, MP) S.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from conan_slam_tpu.ops.frame_kernel import _sweep_si

        mp = -(-2 * nz // 128) * 128
        a = rng.normal(size=(mp, mp)).astype(np.float32)
        s0 = jnp.asarray(a @ a.T / mp + np.eye(mp, dtype=np.float32))

        def sweep_kernel(s_ref, out_ref, scr):
            out_ref[:, :] = _sweep_si(s_ref[:, :], scr)

        def sweeponly_step(carry, _):
            s, acc = carry
            si = pl.pallas_call(
                sweep_kernel,
                out_shape=jax.ShapeDtypeStruct((mp, mp), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((mp, mp), jnp.float32)],
            )(s)
            acc = acc + si[0, 0]
            s = s + 1e-12 * acc * jnp.eye(mp, dtype=jnp.float32)
            return (s, acc), acc

        @jax.jit
        def run_sweeponly(s0, acc0):
            return jax.lax.scan(sweeponly_step, (s0, acc0), None, length=n_frames)
        timeit("sweeponly", run_sweeponly, s0, jnp.float32(0.0))

    if "chol" in modes or "sweep" in modes or "noop" in modes:
        m = 2 * nz
        a = rng.normal(size=(m, m)).astype(np.float32)
        s0 = jnp.asarray(a @ a.T + m * np.eye(m, dtype=np.float32))
        acc0 = jnp.float32(0.0)

        if "chol" in modes:
            @jax.jit
            def run_chol(s0, acc0):
                return jax.lax.scan(chol_step, (s0, acc0), None, length=n_frames)
            timeit("chol", run_chol, s0, acc0)

        if "sweep" in modes:
            @jax.jit
            def run_sweep(s0, acc0):
                return jax.lax.scan(sweep_step, (s0, acc0), None, length=n_frames)
            timeit("sweep", run_sweep, s0, acc0)

        if "noop" in modes:
            @jax.jit
            def run_noop(s0, acc0):
                return jax.lax.scan(noop_step, (s0, acc0), None, length=n_frames)
            timeit("noop", run_noop, s0, acc0)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["full", "factors", "ppass", "smallchain", "chol"]
    main(modes)
