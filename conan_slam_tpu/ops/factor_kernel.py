"""Frame-factor build as ONE Pallas dispatch (the fastframe recursion).

filters.ekf.fastframe._frame_core runs the whole (predict + heading) frame
compounding in 4-coefficient scalar space — a few hundred scalar ops.  Traced
through XLA that becomes dozens of small fusions whose dispatch latency
(~100 us/frame measured on v5e) rivals the O(D^2) covariance pass itself.
This kernel executes the identical recursion inside a single Pallas program:
the coefficient vectors live as (1, 4) lane vectors, the per-sub-step control
inputs are SMEM scalars, and the (NB, D) factor strip materialises in-kernel
as row writes against the resident P e2 column.

Outputs are transposed relative to fastframe.frame_factors: the factor strip
comes out ROW-major (vtf = vmat^T) because both consumers
(ops.frame_kernel.measurement_chain and ops.pallas_update.rank_update_t2)
want row strips — no D-sized transpose anywhere.

Sequential equivalence with frame_factors is validated in
tests/test_pallas_ops.py (interpret mode) and the float32 agreement with the
step-by-step filter transitively via tests/test_fastframe.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TWO_PI = 6.283185307179586


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _wrap(a):
    """wrap to [-pi, pi) via floor (jnp.remainder is not Mosaic-lowerable)."""
    return a - _TWO_PI * jnp.floor((a + jnp.pi) / _TWO_PI)


def coeff_recursion(subs_ref, qc_ref, p2, pose0, *, s_steps, wheel_base, dt,
                    sigma_heading, use_heading):
    """The whole-frame (predict + heading) compounding on 4-coefficient lane
    vectors (filters.ekf.fastframe._frame_core algebra; every vector the
    recursion produces lies in span{P e2, e0, e1, e2}).

    Args: ``subs_ref`` (4, S) SMEM rows [vn, swan, phi_meas, active];
    ``qc_ref`` (3,) SMEM chol(Q) entries; ``p2`` (1, D) value = P e2 row;
    ``pose0`` (1, 3) value.  Returns
    ``(pose, pose_list, corr0, m_c, f_cols, w_cols)``: final/per-sub-step
    (1, 3) pose means, the (1, 1) map mean-correction coefficient
    (x_map += p2 * corr0), and the frame-factor coefficient columns — the
    composed transform ``m_c``, 2S noise-factor columns (unit B weight) and
    S heading-gain columns (B weight sigma_heading^2), each a (1, 4) vector
    representing p2*c[0] + e0*c[1] + e1*c[2] + e2*c[3].
    """
    f32 = jnp.float32
    r_head = sigma_heading * sigma_heading

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 3), 1)

    def c3(a, b, cc):
        out = jnp.zeros((1, 3), jnp.float32)
        out = out + jnp.where(lane3 == 0, a, 0.0)
        out = out + jnp.where(lane3 == 1, b, 0.0)
        out = out + jnp.where(lane3 == 2, cc, 0.0)
        return out

    p22 = p2[:, 2:3]                                    # (1, 1)
    p2h = p2[:, 0:3]                                    # (1, 3)
    pose = pose0                                        # (1, 3)

    def c4(a, b, cc, dd):
        """(1, 4) from four (1, 1) scalars (or python 0.0)."""
        z = jnp.zeros((1, 4), f32)
        out = z
        for i, val in enumerate((a, b, cc, dd)):
            if isinstance(val, float) and val == 0.0:
                continue
            out = out + jnp.where(lane4 == i, val, 0.0)
        return out

    def val2(c):
        return c[:, 0:1] * p22 + c[:, 3:4]

    def head3(c):
        return p2h * c[:, 0:1] + c[:, 1:4]

    qc00 = qc_ref[0]
    qc10 = qc_ref[1]
    qc11 = qc_ref[2]

    gamma = c4(1.0, 0.0, 0.0, 0.0)
    a_list, w_list, v_list = [], [], []
    fb_list = []       # f-pair coefficient rows (list of (b3, f row-2 pair))
    pose_list = []

    for k in range(s_steps):
        vn = subs_ref[0, k]
        swan = subs_ref[1, k]
        phi_meas = subs_ref[2, k]
        act = subs_ref[3, k] > 0.5

        phi = pose[:, 2:3]
        aa = swan + phi
        sa = jnp.sin(aa)
        ca = jnp.cos(aa)
        vdt = vn * dt
        # G = I + u e2^T, u = (Gv02, Gv12, 0).
        gv02 = -vdt * sa
        gv12 = vdt * ca
        u_c = c4(0.0, gv02, gv12, 0.0)
        u_c = jnp.where(act, u_c, 0.0)
        # b3 = Gu @ chol(Q) (2-column noise factor, rows = pose dims).
        ssw = jnp.sin(swan)
        csw = jnp.cos(swan)
        gu00, gu01 = dt * ca, -vdt * sa
        gu10, gu11 = dt * sa, vdt * ca
        gu20, gu21 = dt * ssw / wheel_base, vdt * csw / wheel_base
        b300 = gu00 * qc00 + gu01 * qc10
        b310 = gu10 * qc00 + gu11 * qc10
        b320 = gu20 * qc00 + gu21 * qc10
        b301 = gu01 * qc11
        b311 = gu11 * qc11
        b321 = gu21 * qc11
        zero11 = jnp.zeros((1, 1), f32)
        actf = jnp.where(act, jnp.ones((1, 1), f32), zero11)
        b3 = [
            [b300 * actf, b301 * actf],
            [b310 * actf, b311 * actf],
            [b320 * actf, b321 * actf],
        ]
        f0 = c4(0.0, b3[0][0], b3[1][0], b3[2][0])
        f1 = c4(0.0, b3[0][1], b3[1][1], b3[2][1])
        # col2 <- G col2 + (F F^T) e2 = col2 + u col2[2] + F F[2, :]^T.
        gamma = gamma + u_c * val2(gamma) + f0 * b3[2][0] + f1 * b3[2][1]
        # pose step (exact mean tracking).
        px = pose[:, 0:1] + vdt * ca
        py = pose[:, 1:2] + vdt * sa
        pphi = _wrap(phi + vdt * ssw / wheel_base)
        pose = jnp.where(act, c3(px, py, pphi), pose)

        if use_heading:
            c2 = val2(gamma)
            s_k = c2 + r_head
            w_c = jnp.where(act, gamma / s_k, 0.0)
            vk = jnp.where(act, _wrap(phi_meas - pose[:, 2:3]), zero11)
            w2 = c2 / s_k
            gamma = jnp.where(
                act, (1.0 - w2) * (gamma - w_c * c2) + r_head * w2 * w_c, gamma
            )
            pose = pose + head3(w_c) * vk
            phi_w = pose[:, 2:3]
            pose = pose + jnp.where(lane3 == 2, _wrap(phi_w) - phi_w, 0.0)
            a_c = u_c - w_c
        else:
            w_c = jnp.zeros((1, 4), f32)
            vk = zero11
            a_c = u_c
        a_list.append(a_c)
        fb_list.append((f0, f1, b3))
        w_list.append(w_c)
        v_list.append(vk)
        pose_list.append(pose)

    # Suffix composition t_k (transform AFTER sub-step k) and m = full frame.
    def compose(b, a):
        return a * (1.0 + val2(b)) + b

    t = [None] * s_steps
    acc = jnp.zeros((1, 4), f32)
    for k in range(s_steps - 1, -1, -1):
        t[k] = acc
        acc = compose(a_list[k], acc)
    m_c = acc

    w_prime = [w_list[k] + t[k] * val2(w_list[k]) for k in range(s_steps)]
    f_prime = []
    for k in range(s_steps):
        f0, f1, b3 = fb_list[k]
        c_k = compose(-w_list[k], t[k]) if use_heading else t[k]
        f_prime.append(f0 + c_k * b3[2][0])
        f_prime.append(f1 + c_k * b3[2][1])

    corr0 = jnp.zeros((1, 1), f32)
    if use_heading:
        for k in range(s_steps):
            corr0 = corr0 + v_list[k] * w_list[k][:, 0:1]
    w_cols = w_prime if use_heading else []
    return pose, pose_list, corr0, m_c, f_prime, w_cols


def _factor_kernel(subs_ref, qc_ref, x0_ref, p2_ref,
                   xf_ref, pt_ref, vtf_ref, bm_ref,
                   *, s_steps, nb, nbp, wheel_base, dt, sigma_heading,
                   use_heading):
    f32 = jnp.float32
    d = x0_ref.shape[1]
    r_head = sigma_heading * sigma_heading
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    laned = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)

    p2 = p2_ref[:, :]                                   # (1, D) = P e2
    p22 = p2[:, 2:3]                                    # (1, 1)
    pose, pose_list, corr0, m_c, f_prime, w_prime = coeff_recursion(
        subs_ref, qc_ref, p2, x0_ref[:, 0:3], s_steps=s_steps,
        wheel_base=wheel_base, dt=dt, sigma_heading=sigma_heading,
        use_heading=use_heading,
    )
    for k in range(s_steps):
        pt_ref[k : k + 1, :] = pose_list[k]

    # Mean: pose exact; map components get p2 * sum_k v_k w_k[0].
    base = x0_ref[:, :]
    if use_heading:
        base = base + jnp.where(laned >= 3, p2 * corr0, 0.0)
    xf = jnp.where(laned == 0, pose[:, 0:1],
                   jnp.where(laned == 1, pose[:, 1:2],
                             jnp.where(laned == 2, pose[:, 2:3], base)))
    xf_ref[:, :] = xf

    # Factor strip rows: [m, p2] + 2S f-pairs [+ S w vectors], each the
    # represented vector p2 c[0] + e0 c[1] + e1 c[2] + e2 c[3].
    ep2 = jnp.where(lane4 == 0, 1.0, jnp.zeros((1, 4), f32))
    c_cols = [m_c, ep2] + f_prime + w_prime

    for j, c in enumerate(c_cols):
        row = p2 * c[:, 0:1]
        row = row + jnp.where(laned == 0, c[:, 1:2], 0.0)
        row = row + jnp.where(laned == 1, c[:, 2:3], 0.0)
        row = row + jnp.where(laned == 2, c[:, 3:4], 0.0)
        vtf_ref[j : j + 1, :] = row
    if nbp > nb:
        vtf_ref[nb:nbp, :] = jnp.zeros((nbp - nb, d), f32)

    # Middle matrix: [[p22, 1], [1, 0]] corner, unit diag for the noise
    # pairs, r_head diag for the heading gains.
    ib = jax.lax.broadcasted_iota(jnp.int32, (nbp, nbp), 0)
    jb = jax.lax.broadcasted_iota(jnp.int32, (nbp, nbp), 1)
    bm = jnp.where(
        jnp.logical_and(ib == 0, jb == 0), p22[0, 0], jnp.zeros((nbp, nbp), f32)
    )
    bm = bm + jnp.where(
        jnp.logical_or(
            jnp.logical_and(ib == 0, jb == 1), jnp.logical_and(ib == 1, jb == 0)
        ),
        1.0,
        0.0,
    )
    diag = ib == jb
    bm = bm + jnp.where(
        jnp.logical_and(diag, jnp.logical_and(ib >= 2, ib < 2 + 2 * s_steps)),
        1.0,
        0.0,
    )
    if use_heading:
        bm = bm + jnp.where(
            jnp.logical_and(diag, jnp.logical_and(ib >= 2 + 2 * s_steps, ib < nb)),
            r_head,
            0.0,
        )
    bm_ref[:, :] = bm


def frame_factors_fused(state, vns, swans, phi_meas, active, q_cov,
                        wheel_base, dt, sigma_heading, use_heading: bool,
                        *, interpret: bool = False):
    """Kernel-F entry: fastframe.frame_factors as one Pallas dispatch.

    Returns ``(state', pose_trace (S, 3), vtf (NBP, D), bmat (NBP, NBP))``
    with the factor strip ROW-major and zero-padded to NBP = round_up(NB, 8);
    the frame covariance effect is P + vtf^T bmat vtf.  Falls back to the
    traced fastframe recursion off-TPU (returning the same row-major
    convention).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = state.x.shape[0]
    s_steps = vns.shape[0]
    nb = 2 + 2 * s_steps + (s_steps if use_heading else 0)
    nbp = _round_up(nb, 8)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not interpret and not (on_tpu and d % 128 == 0):
        from conan_slam_tpu.filters.ekf.fastframe import frame_factors

        new_state, pose_trace, vmat, bmat = frame_factors(
            state, vns, swans, phi_meas, active, q_cov, wheel_base, dt,
            sigma_heading, use_heading,
        )
        vtf = jnp.pad(vmat.T, ((0, nbp - nb), (0, 0)))
        bm = jnp.pad(bmat, ((0, nbp - nb), (0, nbp - nb)))
        return new_state, pose_trace, vtf, bm

    f32 = state.x.dtype
    subs = jnp.stack([
        vns.astype(f32), swans.astype(f32), phi_meas.astype(f32),
        active.astype(f32),
    ])                                                   # (4, S)
    from conan_slam_tpu.core.linalg import chol2

    q_chol = chol2(q_cov)
    qc = jnp.stack([q_chol[0, 0], q_chol[1, 0], q_chol[1, 1]])
    x0 = state.x.reshape(1, d)
    p2row = state.p[2:3, :]

    kernel = functools.partial(
        _factor_kernel, s_steps=s_steps, nb=nb, nbp=nbp,
        wheel_base=float(wheel_base), dt=float(dt),
        sigma_heading=float(sigma_heading), use_heading=use_heading,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    xf, pt, vtf, bm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((s_steps, 3), f32),
            jax.ShapeDtypeStruct((nbp, d), f32),
            jax.ShapeDtypeStruct((nbp, nbp), f32),
        ),
        in_specs=[sspec, sspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec, vspec),
        interpret=interpret,
    )(subs, qc, x0, p2row)
    return state._replace(x=xf[0]), pt, vtf, bm
