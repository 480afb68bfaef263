"""Probe variants of the serial sweep inverse (ops.spd_inverse).

The sweep costs ~0.47 us/pivot inside the frame kernels (~19 us/frame at
the production ~40 valid measurements) and is the dominant serial-chain
cost.  Variants:

  v0      - production sweep_ref_inverse (2x2 pivots, one fori_loop step each)
  unroll2 - two pivots per fori_loop body (halve loop bookkeeping)
  unroll4 - four pivots per body

Run on TPU: python benchmarks/probe_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MP = int(os.environ.get("PS_MP", "128"))
NBLK = int(os.environ.get("PS_NBLK", "40"))
FRAMES = int(os.environ.get("PS_FRAMES", "4000"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from conan_slam_tpu.ops.spd_inverse import sweep_ref_inverse

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(MP, MP)).astype(np.float32)
    s_np = (a @ a.T + MP * np.eye(MP)).astype(np.float32)
    dsc = 1.0 / np.sqrt(np.diag(s_np))
    s_np = s_np * dsc[:, None] * dsc[None, :]
    s0 = jnp.asarray(s_np)

    def unrolled_sweep(out_ref, nblk, unroll):
        mp = out_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)

        def pivot(k0):
            rows = out_ref[pl.ds(k0, 2), :]
            r0 = rows[0:1, :]
            r1 = rows[1:2, :]
            l0 = lane == k0
            l1 = lane == k0 + 1
            e00 = jnp.sum(jnp.where(l0, r0, 0.0))
            e01 = jnp.sum(jnp.where(l1, r0, 0.0))
            e11 = jnp.sum(jnp.where(l1, r1, 0.0))
            det = e00 * e11 - e01 * e01
            ok = jnp.logical_and(det > 1e-30, e00 > 1e-20)
            idet = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            i00 = e11 * idet
            i01 = -e01 * idet
            i11 = e00 * idet
            g0 = i00 * r0 + i01 * r1 - jnp.where(l0, i00, 0.0) - jnp.where(l1, i01, 0.0)
            g1 = i01 * r0 + i11 * r1 - jnp.where(l0, i01, 0.0) - jnp.where(l1, i11, 0.0)
            ct = jnp.transpose(rows)
            s0m = sub == k0
            s1m = sub == k0 + 1
            h0 = ct[:, 0:1] - jnp.where(s0m, 1.0, 0.0)
            h1 = ct[:, 1:2] - jnp.where(s1m, 1.0, 0.0)
            piv = jnp.where(
                jnp.logical_or(jnp.logical_and(s0m, l0), jnp.logical_and(s1m, l1)),
                jnp.where(ok, 2.0, 0.0), 0.0)
            out_ref[:, :] = out_ref[:, :] - (h0 * g0 + h1 * g1 + piv)

        def body(j, _):
            for u in range(unroll):
                pivot(2 * (unroll * j + u))
            return 0

        jax.lax.fori_loop(0, nblk // unroll, body, 0)
        out_ref[:, :] = -out_ref[:, :]

    def make(variant):
        def kernel(s_ref, o_ref):
            o_ref[:, :] = s_ref[:, :]
            if variant == "v0":
                sweep_ref_inverse(o_ref, nblk=NBLK)
            else:
                unrolled_sweep(o_ref, NBLK, int(variant[-1]))

        def step(s):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((MP, MP), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(s)
        return step

    # Correctness gate first (vs numpy inverse on the swept block).
    ref = np.linalg.inv(s_np[: 2 * NBLK, : 2 * NBLK])
    for name in ("v0", "unroll2", "unroll4"):
        out = np.asarray(make(name)(s0))
        err = np.abs(out[: 2 * NBLK, : 2 * NBLK] - ref).max()
        print(f"{name}: maxerr {err:.2e}", file=sys.stderr)
        assert err < 1e-4, name

    def timeit(name, step):
        @jax.jit
        def run(s):
            def body(s, _):
                si = step(s)
                # Feed back so iterations are dependent (no overlap), with a
                # tiny perturbation keeping S fixed in practice.
                return s + 0.0 * si[0, 0], si[0, 0]
            return jax.lax.scan(body, s, None, length=FRAMES)

        out = run(s0)
        np.asarray(out[1][-1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(s0)
            np.asarray(out[1][-1])
            ts.append(time.perf_counter() - t0)
        print(f"{name:8s}: {min(ts) / FRAMES * 1e6:8.2f} us/sweep", flush=True)

    for name in ("v0", "unroll2", "unroll4"):
        timeit(name, make(name))


if __name__ == "__main__":
    main()
