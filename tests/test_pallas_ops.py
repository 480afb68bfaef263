"""Pallas kernel tests (interpreter mode on CPU; exact on-chip math is the
same program compiled by Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

def test_rank_update_t_row_strips():
    from conan_slam_tpu.ops.pallas_update import rank_update_t

    rng = np.random.default_rng(5)
    for d in (256, 128):
        rm = 30
        p = rng.normal(size=(d, d)).astype(np.float32)
        p = p @ p.T
        vt = rng.normal(size=(rm, d)).astype(np.float32)
        b = rng.normal(size=(rm, rm)).astype(np.float32)
        b = 0.5 * (b + b.T)
        out = rank_update_t(jnp.asarray(p), jnp.asarray(vt), jnp.asarray(b),
                            interpret=True)
        ref = p + vt.T @ b @ vt
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-2)


def test_spd_inverse_sweep_kernel():
    from conan_slam_tpu.ops.spd_inverse import spd_inverse

    import scipy.linalg as sl

    rng = np.random.default_rng(7)
    for m in (16, 60, 128):
        h = rng.normal(size=(m, m)).astype(np.float64)
        s = h @ h.T + 0.1 * m * np.eye(m)
        # Wildly mixed scales (range^2 vs bearing^2 in the innovation cov).
        scale = np.where(rng.random(m) < 0.5, 1e-2, 1e1)
        s = s * np.outer(scale, scale)
        s32 = s.astype(np.float32)
        si = np.asarray(spd_inverse(jnp.asarray(s32), interpret=True), np.float64)
        si_true = np.linalg.inv(s)

        # Baseline: the float32 Cholesky route on the same (Jacobi-scaled)
        # matrix — the sweep must be in the same accuracy class.
        dsc = (1.0 / np.sqrt(np.diag(s32))).astype(np.float32)
        shat = (s32 * np.outer(dsc, dsc)).astype(np.float32)
        linv = sl.solve_triangular(
            np.linalg.cholesky(shat), np.eye(m, dtype=np.float32),
            lower=True,
        ).astype(np.float32)
        si_chol = (linv.T @ linv).astype(np.float64) * np.outer(dsc, dsc)

        err_sweep = np.abs(si - si_true).max()
        err_chol = np.abs(si_chol - si_true).max()
        assert err_sweep <= 5.0 * err_chol + 1e-12, (m, err_sweep, err_chol)
        # Symmetry by construction.
        np.testing.assert_allclose(si, si.T, rtol=0, atol=np.abs(si).max() * 1e-6)


def test_sweep_si_symmetrizes_asymmetric_input():
    # Regression for the round-2 bench divergence: S inherits asymmetry from
    # the row-gathered strips of an asymmetric P, and sweep_ref_inverse reads
    # pivot columns as rows (valid only for symmetric input) — without the
    # pre/post symmetrization in _sweep_si, asym(S^-1) is proportional to
    # asym(P) and the downdate feeds it back with ~1%/frame gain
    # (exponential growth 1e-7 -> 2e-2 over 1.5k frames, filter divergence
    # at bench frame ~1582).  _sweep_si must invert sym(S) and return an
    # exactly symmetric S^-1.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from conan_slam_tpu.ops.frame_kernel import _sweep_si

    rng = np.random.default_rng(5)
    m = 128
    a = rng.normal(size=(m, m)).astype(np.float32)
    s = a @ a.T / m + np.eye(m, dtype=np.float32)
    e = rng.normal(size=(m, m)).astype(np.float32) * 1e-3
    s_asym = (s + (e - e.T)).astype(np.float32)

    def kernel(s_ref, out_ref, scr):
        out_ref[:, :] = _sweep_si(s_ref[:, :], scr)

    si = np.asarray(
        pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, m), jnp.float32)],
            interpret=True,
        )(jnp.asarray(s_asym))
    )
    # Broken (no symmetrization) gives asym(S^-1) ~ asym(S) ~ 1e-3 here;
    # fixed is ~1e-8 (XLA reassociation keeps it from bitwise zero).
    assert np.abs(si - si.T).max() < 1e-6, "S^-1 must be symmetric"
    ref = np.linalg.inv(0.5 * (s_asym + s_asym.T).astype(np.float64))
    np.testing.assert_allclose(si, ref, rtol=5e-3, atol=1e-4)


def test_spd_inverse_guard_degrades_gracefully():
    from conan_slam_tpu.ops.spd_inverse import spd_inverse

    # Non-finite input -> zeros, not NaN propagation (reference slam.h:431-434).
    s = jnp.asarray(np.full((8, 8), np.nan, np.float32))
    out = np.asarray(spd_inverse(s, interpret=True))
    np.testing.assert_array_equal(out, np.zeros((8, 8), np.float32))


def _obs_glue_inputs(state, obs, slots, mask, nb=12, seed=7):
    """Factor strips + row indices for a frame-update problem."""
    rng = np.random.default_rng(seed)
    d = state.x.shape[0]
    nz = obs.z.shape[0]
    safe = np.clip(np.asarray(slots), 0, state.capacity - 1)
    rows = np.concatenate(
        [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
    ).astype(np.int32)
    b = rng.normal(size=(nb, nb)).astype(np.float32) * 0.1
    bmat = 0.5 * (b + b.T)
    vtf = rng.normal(size=(nb, d)).astype(np.float32) * 0.01
    return jnp.asarray(rows), jnp.asarray(bmat), jnp.asarray(vtf)


def test_frame_update_obs_matches_host_glue():
    # In-kernel observe/operator build vs the host-side glue path
    # (fused_frame_update's megakernel branch algebra).
    from conan_slam_tpu.filters.ekf.update import fused_frame_update
    from conan_slam_tpu.ops.frame_kernel import frame_update_obs

    state, _vmat, _bmat, obs, slots, mask, r_cov = _mega_setup()
    rows, bmat, vtf = _obs_glue_inputs(state, obs, slots, mask)

    ref_state, ref_nis = fused_frame_update(
        state, None, bmat, obs, slots, mask, r_cov,
        use_pallas=False, return_nis=True, vtf=vtf,
    )
    for interpret in (False, True):
        out = frame_update_obs(
            state.p, state.x, rows, obs.z[:, 0], obs.z[:, 1], mask, r_cov,
            bmat, vtf, interpret=interpret,
        )
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref_state.x), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.p), np.asarray(ref_state.p), rtol=1e-3, atol=1e-4
        )
        n_meas = max(float(np.sum(np.asarray(mask))), 1.0)
        np.testing.assert_allclose(
            float(out.nis) / n_meas, float(ref_nis), rtol=1e-3, atol=1e-5
        )


def test_kernel_atan2_matches_numpy():
    from conan_slam_tpu.ops.frame_kernel import _atan2

    rng = np.random.default_rng(2)
    y = rng.normal(size=4096).astype(np.float32) * 100
    x = rng.normal(size=4096).astype(np.float32) * 100
    y[:4] = [0.0, 0.0, 1.0, -1.0]
    x[:4] = [1.0, -1.0, 0.0, 0.0]
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y, x)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def _mega_setup(seed=13, capacity=100, nz=10, nb=12):
    """A realistic fused-frame-update problem with D % 128 == 0."""
    from conan_slam_tpu.filters import ekf as ekf_mod
    from conan_slam_tpu.filters.common import CompactObs

    rng = np.random.default_rng(seed)
    lm = rng.uniform(-50, 50, size=(capacity, 2)).astype(np.float32)
    state = ekf_mod.init_state_with_map(lm, sigma0=0.5, pad_multiple=128)
    d = state.x.shape[0]
    assert d % 128 == 0
    # Correlated covariance: P = A A^T scaled down + the init diag.
    a = rng.normal(size=(d, 8)).astype(np.float32) * 0.05
    state = state._replace(p=state.p + jnp.asarray(a @ a.T))
    ids = rng.choice(capacity, size=nz, replace=False).astype(np.int32)
    z = np.stack(
        [
            np.hypot(lm[ids, 0], lm[ids, 1]) + rng.normal(size=nz) * 0.1,
            np.arctan2(lm[ids, 1], lm[ids, 0]) + rng.normal(size=nz) * 0.01,
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.ones(nz, bool)
    mask[-2] = False
    obs = CompactObs(z=jnp.asarray(z), ids=jnp.asarray(ids), mask=jnp.asarray(mask))
    slots = jnp.asarray(ids)   # identity table in init_state_with_map
    vmat = jnp.asarray(rng.normal(size=(d, nb)).astype(np.float32) * 0.01)
    b = rng.normal(size=(nb, nb)).astype(np.float32) * 0.1
    bmat = jnp.asarray(0.5 * (b + b.T))
    r_cov = jnp.diag(jnp.asarray([0.1**2, 0.5 * np.pi / 180], jnp.float32) ** 1)
    return state, vmat, bmat, obs, slots, jnp.asarray(mask), r_cov


def test_fused_frame_update_megakernel_matches_ops_path():
    from conan_slam_tpu.filters.ekf.update import fused_frame_update

    state, vmat, bmat, obs, slots, mask, r_cov = _mega_setup()
    ref_state, ref_nis = fused_frame_update(
        state, vmat, bmat, obs, slots, mask, r_cov,
        use_pallas=False, return_nis=True,
    )
    mega_state, mega_nis = fused_frame_update(
        state, vmat, bmat, obs, slots, mask, r_cov,
        use_pallas=True, return_nis=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(mega_state.x), np.asarray(ref_state.x), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mega_state.p), np.asarray(ref_state.p), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(mega_nis), float(ref_nis), rtol=1e-3, atol=1e-5
    )


def test_fused_frame_update_megakernel_all_masked():
    # A frame with no associated measurements degenerates to the factored
    # correction alone (P + V B V^T), mean unchanged.
    from conan_slam_tpu.filters.ekf.update import fused_frame_update

    state, vmat, bmat, obs, slots, mask, r_cov = _mega_setup(seed=17)
    mask = jnp.zeros_like(mask)
    out, _ = fused_frame_update(
        state, vmat, bmat, obs, slots, mask, r_cov,
        use_pallas=True, return_nis=True, interpret=True,
    )
    ref_p = state.p + vmat @ bmat @ vmat.T
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(state.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref_p), rtol=1e-3, atol=1e-4)


def test_frame_factor_kernel_matches_fastframe():
    from conan_slam_tpu.filters.ekf.fastframe import frame_factors
    from conan_slam_tpu.ops.factor_kernel import frame_factors_fused

    for use_heading, seed in ((True, 23), (False, 29)):
        state, *_ = _mega_setup(seed=seed)
        rng = np.random.default_rng(seed)
        s = 6
        vns = jnp.asarray(83.33 + rng.normal(size=s).astype(np.float32) * 0.3)
        swans = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
        phis = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
        active = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], bool))
        q = jnp.diag(jnp.asarray([0.3**2, (np.pi / 180) ** 2], jnp.float32))
        args = (vns, swans, phis, active, q, 73.0, 0.01, 0.01 * np.pi / 180)

        ref_state, ref_pt, ref_vmat, ref_bmat = frame_factors(
            state, *args, use_heading
        )
        out_state, out_pt, vtf, bm = frame_factors_fused(
            state, *args, use_heading, interpret=True
        )
        nb = ref_bmat.shape[0]
        np.testing.assert_allclose(
            np.asarray(out_state.x), np.asarray(ref_state.x), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_pt), np.asarray(ref_pt), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(vtf[:nb]), np.asarray(ref_vmat.T), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(bm[:nb, :nb]), np.asarray(ref_bmat), rtol=1e-5, atol=1e-6
        )
        # Padding rows must be exactly zero.
        np.testing.assert_array_equal(np.asarray(vtf[nb:]), 0.0)
        np.testing.assert_array_equal(np.asarray(bm[nb:, :]), 0.0)


def _frame_step_problem(seed=31, s=6):
    """A realistic whole-frame-step problem (factors + obs in one kernel)."""
    state, _vmat, _bmat, obs, slots, mask, r_cov = _mega_setup(seed=seed)
    rng = np.random.default_rng(seed)
    vns = jnp.asarray(83.33 + rng.normal(size=s).astype(np.float32) * 0.3)
    swans = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    phis = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    active = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], bool))
    q = jnp.diag(jnp.asarray([0.3**2, (np.pi / 180) ** 2], jnp.float32))
    return state, obs, slots, mask, r_cov, (vns, swans, phis, active, q)


def test_frame_step_kernel_matches_factored_path():
    # The one-dispatch whole-frame-step kernel (coefficient recursion +
    # observe + chain + rank-4 frame correction) vs frame_factors followed by
    # the non-Pallas fused_frame_update — identical algebra, so agreement is
    # tight float32.
    from conan_slam_tpu.filters.ekf.fastframe import frame_factors
    from conan_slam_tpu.filters.ekf.update import fused_frame_update
    from conan_slam_tpu.ops.frame_kernel import frame_step

    for use_heading, seed in ((True, 31), (False, 37)):
        state, obs, slots, mask, r_cov, fargs = _frame_step_problem(seed=seed)
        vns, swans, phis, active, q = fargs

        ref1, ref_pt, ref_vmat, ref_bmat = frame_factors(
            state, vns, swans, phis, active, q, 73.0, 0.01,
            0.01 * np.pi / 180, use_heading,
        )
        ref_state, ref_nis = fused_frame_update(
            ref1, ref_vmat, ref_bmat, obs, slots, mask, r_cov,
            use_pallas=False, return_nis=True,
        )

        safe = np.clip(np.asarray(slots), 0, state.capacity - 1)
        rows = np.concatenate(
            [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
        ).astype(np.int32)
        n_meas = max(float(np.sum(np.asarray(mask))), 1.0)
        for interpret in (False, True):
            out = frame_step(
                state.p, state.x, jnp.asarray(rows), vns, swans, phis, active,
                q, obs.z[:, 0], obs.z[:, 1], mask, r_cov, 73.0, 0.01,
                0.01 * np.pi / 180, use_heading, interpret=interpret,
            )
            np.testing.assert_allclose(
                np.asarray(out.pose_trace), np.asarray(ref_pt),
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(out.x), np.asarray(ref_state.x), rtol=1e-4, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(out.p), np.asarray(ref_state.p), rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                float(out.nis) / n_meas, float(ref_nis), rtol=1e-3, atol=1e-5
            )


def test_fused_frame_step_wrapper_matches_kernel_semantics():
    # The filters.ekf entry (association-known whole frame) must agree with
    # the factored path regardless of which branch it picks.
    from conan_slam_tpu.filters.ekf.update import fused_frame_step

    state, obs, slots, mask, r_cov, fargs = _frame_step_problem(seed=41)
    vns, swans, phis, active, q = fargs

    ref_state, ref_pt, ref_nis = fused_frame_step(
        state, vns, swans, phis, active, q, obs, slots, mask, r_cov,
        73.0, 0.01, 0.01 * np.pi / 180, True,
    )
    out_state, out_pt, out_nis = fused_frame_step(
        state, vns, swans, phis, active, q, obs, slots, mask, r_cov,
        73.0, 0.01, 0.01 * np.pi / 180, True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_pt), np.asarray(ref_pt), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_state.x), np.asarray(ref_state.x), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_state.p), np.asarray(ref_state.p), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out_nis), float(ref_nis), rtol=1e-3, atol=1e-5
    )


def test_frame_step_all_masked_is_factor_only():
    # No associated measurements: the frame step degenerates to the factored
    # predict+heading correction alone (P + V B V^T, mean = factor mean).
    from conan_slam_tpu.filters.ekf.fastframe import frame_predict_heading
    from conan_slam_tpu.ops.frame_kernel import frame_step

    state, obs, slots, mask, r_cov, fargs = _frame_step_problem(seed=43)
    vns, swans, phis, active, q = fargs
    mask = jnp.zeros_like(mask)

    ref_state = frame_predict_heading(
        state, vns, swans, phis, active, q, 73.0, 0.01,
        0.01 * np.pi / 180, True,
    )
    safe = np.clip(np.asarray(slots), 0, state.capacity - 1)
    rows = np.concatenate(
        [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
    ).astype(np.int32)
    out = frame_step(
        state.p, state.x, jnp.asarray(rows), vns, swans, phis, active, q,
        obs.z[:, 0], obs.z[:, 1], mask, r_cov, 73.0, 0.01,
        0.01 * np.pi / 180, True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref_state.x), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.p), np.asarray(ref_state.p), rtol=1e-3, atol=1e-4
    )
    assert abs(float(out.nis)) < 1e-6


def test_gating_kernel_matches_jnp_association():
    # Blocked Pallas gating (ops.gating_kernel) vs the dense jnp path, with
    # and without the virtual-covariance correction, odd K (panel padding)
    # and an out-of-range measurement that must found a new feature.
    from conan_slam_tpu.filters import ekf as ekf_mod
    from conan_slam_tpu.filters.common import CompactObs

    rng = np.random.default_rng(51)
    k = 87
    lm = rng.uniform(-60, 60, size=(k, 2)).astype(np.float32)
    state = ekf_mod.init_state_with_map(lm, sigma0=0.4, pad_multiple=128)
    a = rng.normal(size=(state.x.shape[0], 6)).astype(np.float32) * 0.03
    state = state._replace(
        p=state.p + jnp.asarray(a @ a.T),
        n_active=jnp.int32(k - 5),       # last 5 slots inactive
    )
    nz = 12
    ids = rng.choice(k - 5, size=nz, replace=False).astype(np.int32)
    z = np.stack(
        [
            np.hypot(lm[ids, 0], lm[ids, 1]) + rng.normal(size=nz) * 0.1,
            np.arctan2(lm[ids, 1], lm[ids, 0]) + rng.normal(size=nz) * 0.01,
        ],
        axis=-1,
    ).astype(np.float32)
    z[-1] = [500.0, 1.0]                 # far away: new feature
    mask = np.ones(nz, bool)
    mask[-2] = False
    obs = CompactObs(z=jnp.asarray(z), ids=jnp.asarray(ids), mask=jnp.asarray(mask))
    r_cov = jnp.diag(jnp.asarray([0.1**2, (np.pi / 180) ** 2], jnp.float32))

    nb = 10
    vmat = jnp.asarray(rng.normal(size=(state.x.shape[0], nb)).astype(np.float32) * 0.01)
    b = rng.normal(size=(nb, nb)).astype(np.float32) * 0.1
    bmat = jnp.asarray(0.5 * (b + b.T))

    for vm, bm in ((None, None), (vmat, bmat)):
        ref = ekf_mod.associate_gated(
            state, obs, r_cov, 50.0, 1000.0, vm, bm, use_pallas=False
        )
        got = ekf_mod.associate_gated(
            state, obs, r_cov, 50.0, 1000.0, vm, bm,
            use_pallas=True, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got.known_mask), np.asarray(ref.known_mask)
        )
        np.testing.assert_array_equal(
            np.asarray(got.new_mask), np.asarray(ref.new_mask)
        )
        km = np.asarray(ref.known_mask)
        np.testing.assert_array_equal(
            np.asarray(got.slots)[km], np.asarray(ref.slots)[km]
        )
        assert np.asarray(got.new_mask)[-1]          # the far measurement


def test_frame_step_big_schedule_matches_resident():
    # The big-D streaming pair (chain kernel + generic 2-D rank update) must
    # agree with the resident one-dispatch schedule and the jnp reference.
    from conan_slam_tpu.ops.frame_kernel import frame_step

    for use_heading, seed in ((True, 61), (False, 67)):
        state, obs, slots, mask, r_cov, fargs = _frame_step_problem(seed=seed)
        vns, swans, phis, active, q = fargs
        safe = np.clip(np.asarray(slots), 0, state.capacity - 1)
        rows = np.concatenate(
            [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
        ).astype(np.int32)
        args = (state.p, state.x, jnp.asarray(rows), vns, swans, phis, active,
                q, obs.z[:, 0], obs.z[:, 1], mask, r_cov, 73.0, 0.01,
                0.01 * np.pi / 180, use_heading)
        ref = frame_step(*args)                       # jnp reference (CPU)
        big = frame_step(*args, interpret=True, _force_schedule="big")
        np.testing.assert_allclose(
            np.asarray(big.pose_trace), np.asarray(ref.pose_trace),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(big.x), np.asarray(ref.x), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(big.p), np.asarray(ref.p), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            float(big.nis), float(ref.nis), rtol=1e-3, atol=1e-5
        )


def _pair_second_frame(x_post_a, capacity, nz, seed):
    """Frame-B inputs for the pair test: fresh controls and measurements of
    (possibly different) slots against the SAME association table.
    Measurements and heading observations are generated against the POST-
    frame-A state so innovations sit at the realistic noise scale (frame-B
    errors are proportional to update magnitude; a pathological-NIS frame
    only measures conditioning amplification, not the algebra)."""
    rng = np.random.default_rng(seed)
    s = 6
    vns = jnp.asarray(83.33 + rng.normal(size=s).astype(np.float32) * 0.3)
    swans = jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.02)
    xs = np.asarray(x_post_a)
    phis = jnp.asarray(
        xs[2] + rng.normal(size=s).astype(np.float32) * 0.01
    )
    active = jnp.ones((s,), bool)
    ids = rng.choice(int(capacity), size=nz, replace=False).astype(np.int32)
    fx = xs[3 + 2 * ids] - xs[0]
    fy = xs[4 + 2 * ids] - xs[1]
    zr = (np.hypot(fx, fy) + rng.normal(size=nz) * 0.1).astype(np.float32)
    zb = (np.arctan2(fy, fx) - xs[2] + rng.normal(size=nz) * 0.01).astype(
        np.float32
    )
    mask = np.ones(nz, bool)
    mask[0] = False
    rows = np.concatenate(
        [np.arange(3), (3 + 2 * ids[:, None] + np.arange(2)).reshape(-1)]
    ).astype(np.int32)
    return (vns, swans, phis, active), (jnp.asarray(zr), jnp.asarray(zb),
                                        jnp.asarray(mask)), jnp.asarray(rows)


def test_frame_step_pair_matches_sequential_frames():
    # The fused two-frame step (2 chain dispatches + ONE stacked rank pass,
    # frame-B strips reconstructed from G_A/M_A) vs two sequential
    # frame_step calls — identical algebra; rounding differs only through
    # the reconstructed strips' product order.
    from conan_slam_tpu.ops.frame_kernel import frame_step, frame_step_pair

    for use_heading, seed in ((True, 71), (False, 73)):
        state, obs, slots, mask, r_cov, fargs = _frame_step_problem(seed=seed)
        vns, swans, phis, active, q = fargs
        safe = np.clip(np.asarray(slots), 0, state.capacity - 1)
        rows_a = np.concatenate(
            [np.arange(3), (3 + 2 * safe[:, None] + np.arange(2)).reshape(-1)]
        ).astype(np.int32)
        fa = frame_step(
            state.p, state.x, jnp.asarray(rows_a), vns, swans, phis, active,
            q, obs.z[:, 0], obs.z[:, 1], mask, r_cov, 73.0, 0.01,
            0.01 * np.pi / 180, use_heading,
        )
        ctrl_b, meas_b, rows_b = _pair_second_frame(
            fa.x, state.capacity, obs.z.shape[0], seed + 100
        )
        fb = frame_step(
            fa.p, fa.x, rows_b, *ctrl_b, q, *meas_b, r_cov, 73.0, 0.01,
            0.01 * np.pi / 180, use_heading,
        )

        pair = frame_step_pair(
            state.p, state.x, jnp.asarray(rows_a),
            (vns, swans, phis, active), (obs.z[:, 0], obs.z[:, 1], mask),
            rows_b, ctrl_b, meas_b, q, r_cov, 73.0, 0.01,
            0.01 * np.pi / 180, use_heading, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(pair.pose_trace[0]), np.asarray(fa.pose_trace),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(pair.pose_trace[1]), np.asarray(fb.pose_trace),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(pair.x), np.asarray(fb.x), rtol=1e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pair.p), np.asarray(fb.p), rtol=1e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pair.nis),
            np.asarray([float(fa.nis), float(fb.nis)]), rtol=1e-3, atol=1e-5,
        )


def test_hi6_tier_survives_covariance_collapse():
    # The gated-path failure mode distilled: P_post = P - W^T W where the
    # downdate cancels ~all of P (a fresh far landmark observed once,
    # prior/posterior ratio ~1e-4).  16-bit split tiers' ~2^-16 product
    # error exceeds the posterior; the 3-way "hi6" tier (24 mantissa bits)
    # must hold fp32-level accuracy.  float64 oracle.
    from conan_slam_tpu.ops.pallas_update import rank_update_t

    rng = np.random.default_rng(17)
    d, r = 256, 64
    w64 = rng.normal(size=(r, d)).astype(np.float64) * 35.0   # ~fresh sigma
    gram = w64.T @ w64
    p64 = gram * (1.0 + 1e-4) + np.eye(d) * 0.05
    ref = p64 - gram                                          # ~1e-4 * gram
    p32 = jnp.asarray(p64.astype(np.float32))
    w32 = jnp.asarray(w64.astype(np.float32))
    neg_eye = jnp.asarray(-np.eye(r, dtype=np.float32))

    scale = np.abs(ref).max()
    errs = {}
    for mode in ("hi6", "split3"):
        out = np.asarray(
            rank_update_t(p32, w32, neg_eye, mode=mode, interpret=True),
            np.float64,
        )
        errs[mode] = np.abs(out - ref).max() / scale
    # hi6 carries ~21-23 effective mantissa bits through the product
    # (measured ~8e-3 of the collapsed result on this distillation);
    # split3 is ~6x worse and detonates the full 10k course (ATE nan).
    # hi6 itself stays numerically stable end-to-end but still perturbs
    # the association GATES (mapped 614 -> 226 on the 10k course), so the
    # gated path defaults to HIGHEST — see fused_frame_update.
    assert errs["hi6"] < 2e-2, errs
    assert errs["split3"] > 3 * errs["hi6"], errs


def test_fused_frame_update_hi6_branch_matches_standard():
    # The big-D gated branch (hi6 fast tier) reduces to the same algebra —
    # on CPU both route through the exact reference rank update.
    from conan_slam_tpu.filters.ekf.update import fused_frame_update

    state, vmat, bmat, obs, slots, mask, r_cov = _mega_setup(seed=29)
    ref_state, ref_nis = fused_frame_update(
        state, vmat, bmat, obs, slots, mask, r_cov,
        use_pallas=False, return_nis=True, _force_gram=False,
    )
    out_state, out_nis = fused_frame_update(
        state, vmat, bmat, obs, slots, mask, r_cov,
        use_pallas=False, return_nis=True, _force_gram=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.p), np.asarray(ref_state.p),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(float(out_nis), float(ref_nis), rtol=1e-5)
