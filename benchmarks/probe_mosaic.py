"""On-chip probes for Mosaic lowering of the frame_update_obs pieces.

Bisects interpret-vs-hardware discrepancies: each probe runs ONE suspect
construct as its own pallas_call on the real backend and checks it against
numpy.  Usage: python benchmarks/probe_mosaic.py [dots|observe|all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_dots():
    """Transposed dot_general orientations used by the new kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    d, mp, rp = 512, 128, 136
    prows = rng.normal(size=(rp, d)).astype(np.float32)
    hc = rng.normal(size=(mp, rp)).astype(np.float32)
    si = rng.normal(size=(mp, mp)).astype(np.float32)
    siv = rng.normal(size=(1, mp)).astype(np.float32)

    hi = jax.lax.Precision.HIGHEST

    def kernel(prows_ref, hc_ref, si_ref, siv_ref, o1, o2, o3):
        f32 = jnp.float32
        # (D, MP) = contract sublane of both: prows^T @ hc^T.
        phtt = jax.lax.dot_general(
            prows_ref[:, :], hc_ref[:, :],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )
        o1[:, :] = phtt
        # (MP, D) = si @ phtt^T (contract lane of both).
        o2[:, :] = jax.lax.dot_general(
            si_ref[:, :], phtt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )
        # (1, D) = siv @ phtt^T.
        o3[:, :] = jax.lax.dot_general(
            siv_ref[:, :], phtt,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi,
        )

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    o1, o2, o3 = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((d, mp), jnp.float32),
                jax.ShapeDtypeStruct((mp, d), jnp.float32),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
            ),
            in_specs=[vspec] * 4,
            out_specs=(vspec, vspec, vspec),
        )(*a)
    )(prows, hc, si, siv)
    ref1 = prows.T @ hc.T
    ref2 = si @ ref1.T
    ref3 = siv @ ref1.T
    for name, got, ref in (("phtt", o1, ref1), ("sipht", o2, ref2), ("sivpht", o3, ref3)):
        err = np.max(np.abs(np.asarray(got) - ref)) / max(np.max(np.abs(ref)), 1e-9)
        log(f"dots/{name}: rel {err:.2e}")
        assert err < 1e-4, (name, err)
    log("probe dots: PASS")


def probe_observe():
    """_observe_core (atan2/wrap/SMEM scalars/iota spreads) on hardware."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from conan_slam_tpu.ops.frame_kernel import _observe_core

    rng = np.random.default_rng(1)
    nz = 64
    mp = 128
    nzl = mp // 2
    rp = 136
    nr = 131
    xrows = np.zeros((1, rp), np.float32)
    xrows[0, :3] = [1.0, -2.0, 0.3]
    feats = rng.uniform(-60, 60, size=(nz, 2)).astype(np.float32)
    xrows[0, 3 : 3 + 2 * nz] = feats.reshape(-1)
    mask = np.ones(nz, np.float32)
    mask[5] = 0.0
    dx = feats[:, 0] - xrows[0, 0]
    dy = feats[:, 1] - xrows[0, 1]
    dist = np.hypot(dx, dy)
    brg = np.arctan2(dy, dx) - xrows[0, 2]
    zin = np.zeros((8, nzl), np.float32)
    zin[0, :nz] = (dist + rng.normal(size=nz) * 0.1) * mask
    zin[1, :nz] = (brg + rng.normal(size=nz) * 0.01) * mask
    zin[2, :nz] = mask
    rsc = np.asarray([0.01, 0.0, 0.0, 7.6e-5], np.float32)

    def kernel(xr_ref, zin_ref, rsc_ref, hc_o, rm_o, v_o):
        hc, rmat, v2 = _observe_core(xr_ref[:, :], zin_ref[:, :], rsc_ref, mp, rp)
        hc_o[:, :] = hc
        rm_o[:, :] = rmat
        v_o[:, :] = v2

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hc, rmat, v2 = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((mp, rp), jnp.float32),
                jax.ShapeDtypeStruct((mp, mp), jnp.float32),
                jax.ShapeDtypeStruct((1, mp), jnp.float32),
            ),
            in_specs=[vspec, vspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=(vspec, vspec, vspec),
        )(*a)
    )(xrows, zin, rsc)
    hc = np.asarray(hc)
    rmat = np.asarray(rmat)
    v2 = np.asarray(v2)

    # numpy reference (same algebra as _frame_update_obs_reference).
    idx = np.arange(nzl)
    fxs = np.zeros(nzl, np.float64)
    fys = np.zeros(nzl, np.float64)
    fxs[:nz] = feats[:, 0]
    fys[:nz] = feats[:, 1]
    m = zin[2].astype(np.float64)
    px, py, phi = xrows[0, :3].astype(np.float64)
    dxl = fxs - px
    dyl = fys - py
    d2 = np.maximum(dxl**2 + dyl**2, 1e-12)
    dd = np.sqrt(d2)
    bpred = np.arctan2(dyl, dxl) - phi
    vr = (zin[0].astype(np.float64) - dd) * m
    dbr = zin[1].astype(np.float64) - bpred
    vb = (dbr - 2 * np.pi * np.floor((dbr + np.pi) / (2 * np.pi))) * m
    v_ref = np.zeros(mp)
    v_ref[2 * idx] = vr
    v_ref[2 * idx + 1] = vb
    hc_ref = np.zeros((mp, rp))
    hc_ref[2 * idx, 0] = -dxl / dd * m
    hc_ref[2 * idx, 1] = -dyl / dd * m
    hc_ref[2 * idx + 1, 0] = dyl / d2 * m
    hc_ref[2 * idx + 1, 1] = -dxl / d2 * m
    hc_ref[2 * idx + 1, 2] = -m
    hc_ref[2 * idx, 3 + 2 * idx] = dxl / dd * m
    hc_ref[2 * idx, 4 + 2 * idx] = dyl / dd * m
    hc_ref[2 * idx + 1, 3 + 2 * idx] = -dyl / d2 * m
    hc_ref[2 * idx + 1, 4 + 2 * idx] = dxl / d2 * m
    rm_ref = np.zeros((mp, mp))
    rm_ref[2 * idx, 2 * idx] = np.where(m > 0, rsc[0], 1.0)
    rm_ref[2 * idx + 1, 2 * idx + 1] = np.where(m > 0, rsc[3], 1.0)

    for name, got, ref, tol in (
        ("hc", hc, hc_ref, 1e-4), ("rmat", rmat, rm_ref, 1e-5),
        ("v", v2[0], v_ref, 1e-4),
    ):
        err = np.max(np.abs(got - ref))
        log(f"observe/{name}: max abs {err:.2e}")
        assert err < tol, (name, err)
    log("probe observe: PASS")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}")
    if which in ("dots", "all"):
        probe_dots()
    if which in ("observe", "all"):
        probe_observe()
    log("probe_mosaic: ALL PASS")


if __name__ == "__main__":
    main()
