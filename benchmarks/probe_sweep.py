"""Probe variants of the serial sweep inverse (ops.spd_inverse).

The sweep costs ~0.47 us/pivot inside the frame kernels (~19 us/frame at
the production ~40 valid measurements) and is the dominant serial-chain
cost.  Variants:

  v0      - production sweep_ref_inverse (2x2 pivots, one fori_loop step each)
  unroll2 - two pivots per fori_loop body (halve loop bookkeeping)
  unroll4 - four pivots per body
  wide4   - TWO pivots fused into ONE full-matrix RMW (panel-local second
            pivot + rank-4 combined update)

MEASURED (v5e, MP=128, NBLK=40, round 5): v0 24.5 / unroll2 22.7 /
unroll4 23.1 / wide4 27.6 us — ALL variants within noise of or slower
than v0.  Negative result: the sweep's serial latency is the dependent
small-op chain (extractions, scalar 2x2 algebra, lane shifts), NOT the
fori_loop bookkeeping and NOT the per-pivot full-matrix read-modify-write
(wide4 halves the RMWs, pays ~8 extra lane extractions, and loses).
Cutting the sweep further needs fewer DEPENDENT OPS per pivot, not fewer
pivot iterations.
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

    def paired_sweep(out_ref, nblk):
        """TWO classic 2x2 pivots fused into ONE full-matrix RMW.

        The classic sweep's serial chain is dominated by the full (mp, mp)
        read-modify-write per pivot; pivot k0+1 only needs its own ROWS
        (held in a register panel after applying pivot k0 locally) and its
        COLUMNS (symmetry + a cheap rank-2 lane correction), so both
        pivots' rank-2 updates can be applied in one fused pass."""
        mp = out_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)

        def local_pivot(r0, r1, k0):
            """Folded 2x2 pivot factors from the two pivot rows."""
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
            g0 = (i00 * r0 + i01 * r1
                  - jnp.where(l0, i00, 0.0) - jnp.where(l1, i01, 0.0))
            g1 = (i01 * r0 + i11 * r1
                  - jnp.where(l0, i01, 0.0) - jnp.where(l1, i11, 0.0))
            return g0, g1, ok

        def lane_at(row, k):
            return jnp.sum(jnp.where(lane == k, row, 0.0))

        def body(j, _):
            k0 = 4 * j
            rows4 = out_ref[pl.ds(k0, 4), :]               # (4, mp)
            ct4 = jnp.transpose(rows4)                     # (mp, 4) (symmetry)
            # --- pivot A on (k0, k0+1) ---
            g0, g1, okA = local_pivot(rows4[0:1, :], rows4[1:2, :], k0)
            h0 = ct4[:, 0:1] - jnp.where(sub == k0, 1.0, 0.0)
            h1 = ct4[:, 1:2] - jnp.where(sub == k0 + 1, 1.0, 0.0)
            # Panel rows k0+2, k0+3 after pivot A (their h-coeffs are the
            # c0/c1 entries at those rows, shifted by nothing — they are
            # not pivot-A strip rows).
            a20 = lane_at(rows4[2:3, :], k0)
            a21 = lane_at(rows4[2:3, :], k0 + 1)
            a30 = lane_at(rows4[3:4, :], k0)
            a31 = lane_at(rows4[3:4, :], k0 + 1)
            r2 = rows4[2:3, :] - a20 * g0 - a21 * g1
            r3 = rows4[3:4, :] - a30 * g0 - a31 * g1
            # --- pivot B on (k0+2, k0+3) with post-A rows ---
            g2, g3, okB = local_pivot(r2, r3, k0 + 2)
            # Post-A columns of k0+2 / k0+3 over all rows: the rank-2
            # correction evaluated at those lanes.
            g0c2 = lane_at(g0, k0 + 2)
            g1c2 = lane_at(g1, k0 + 2)
            g0c3 = lane_at(g0, k0 + 3)
            g1c3 = lane_at(g1, k0 + 3)
            c2 = ct4[:, 2:3] - h0 * g0c2 - h1 * g1c2
            c3 = ct4[:, 3:4] - h0 * g0c3 - h1 * g1c3
            h2 = c2 - jnp.where(sub == k0 + 2, 1.0, 0.0)
            h3 = c3 - jnp.where(sub == k0 + 3, 1.0, 0.0)
            piv = jnp.where(
                jnp.logical_and(sub == k0, lane == k0)
                | jnp.logical_and(sub == k0 + 1, lane == k0 + 1),
                jnp.where(okA, 2.0, 0.0), 0.0,
            ) + jnp.where(
                jnp.logical_and(sub == k0 + 2, lane == k0 + 2)
                | jnp.logical_and(sub == k0 + 3, lane == k0 + 3),
                jnp.where(okB, 2.0, 0.0), 0.0,
            )
            out_ref[:, :] = out_ref[:, :] - (
                h0 * g0 + h1 * g1 + h2 * g2 + h3 * g3 + piv
            )
            return 0

        jax.lax.fori_loop(0, nblk // 2, body, 0)
        if nblk % 2:
            # Ragged tail: one classic pivot.
            pass
        out_ref[:, :] = -out_ref[:, :]

    def make(variant):
        def kernel(s_ref, o_ref):
            o_ref[:, :] = s_ref[:, :]
            if variant == "v0":
                sweep_ref_inverse(o_ref, nblk=NBLK)
            elif variant == "wide4":
                paired_sweep(o_ref, NBLK)
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
    for name in ("v0", "unroll2", "unroll4", "wide4"):
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

    for name in ("v0", "unroll2", "unroll4", "wide4"):
        timeit(name, make(name))


if __name__ == "__main__":
    main()
