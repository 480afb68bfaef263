"""Probe schedules for the O(D^2) panel rank pass (P += Vt^T B Vt).

The measured pass is DMA + MXU *serial* (rank-288 @ split3 = 78 us at
D=2304 vs max(DMA 33, MXU 45) ~ 47 us if overlapped).  This probe times
kernel-schedule variants to find one that pipelines:

  v0      - current production kernel (ops.pallas_update.rank_update_t)
  tr128   - row panels of 128 (more steps, smaller buffers)
  accum   - separate += statements per split term (fewer live temps)
  arb     - dimension_semantics=("arbitrary",)
  grid2d  - (256 x 1024) 2-D tiles, strips blocked per (i, j)

Run on TPU: python benchmarks/probe_rankpass.py [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = int(os.environ.get("RP_D", "2304"))
RANK = int(os.environ.get("RP_RANK", "288"))
FRAMES = int(os.environ.get("RP_FRAMES", "4000"))


def main(variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from conan_slam_tpu.ops.frame_kernel import panel_dot_split, split_hi_lo
    from conan_slam_tpu.ops.pallas_update import rank_update_t

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    d, rm = D, RANK
    p0 = jnp.asarray(np.eye(d, dtype=np.float32))
    vt = jnp.asarray(rng.normal(size=(rm, d)).astype(np.float32) * 1e-4)
    b = jnp.asarray(np.eye(rm, dtype=np.float32) * 1e-6)

    def timeit(name, step):
        @jax.jit
        def run(p):
            def body(p, _):
                p = step(p)
                return p, p[0, 0]
            return jax.lax.scan(body, p, None, length=FRAMES)

        out = run(p0)
        np.asarray(out[1][-1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(p0)
            np.asarray(out[1][-1])
            ts.append(time.perf_counter() - t0)
        print(f"{name:8s}: {min(ts) / FRAMES * 1e6:8.1f} us/pass", flush=True)

    vbt = jnp.matmul(b, vt, precision=jax.lax.Precision.HIGHEST)
    vth, vtl = split_hi_lo(vt)
    vbh, vbl = split_hi_lo(vbt)

    def make_variant(tr, style, arb=False, tc=None):
        dn = (((0,), (0,)), ((), ()))

        if style == "accum":
            def kernel(p_ref, a_ref, al_ref, b_ref, bl_ref, o_ref):
                o_ref[:, :] = p_ref[:, :]
                o_ref[:, :] += jax.lax.dot_general(
                    a_ref[:, :], b_ref[:, :], dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                o_ref[:, :] += jax.lax.dot_general(
                    a_ref[:, :], bl_ref[:, :], dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                o_ref[:, :] += jax.lax.dot_general(
                    al_ref[:, :], b_ref[:, :], dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        else:
            def kernel(p_ref, a_ref, al_ref, b_ref, bl_ref, o_ref):
                o_ref[:, :] = p_ref[:, :] + panel_dot_split(
                    a_ref[:, :], al_ref[:, :], b_ref[:, :], bl_ref[:, :],
                    dn, mode="split3")

        params = {}
        if arb:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",))

        if tc is None:
            def step(p):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
                    grid=(d // tr,),
                    in_specs=[
                        pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tr), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    **params,
                )(p, vth, vtl, vbh, vbl)
        else:
            def step(p):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
                    grid=(d // tr, d // tc),
                    in_specs=[
                        pl.BlockSpec((tr, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tr), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                        pl.BlockSpec((rm, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                    **params,
                )(p, vth, vtl, vbh, vbl)

        return step

    if "copy" in variants:
        # Pure stream: out = in at tr=256 — the true DMA floor.
        def copy_kernel(p_ref, o_ref):
            o_ref[:, :] = p_ref[:, :]

        def copy_step(p):
            return pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
                grid=(d // 256,),
                in_specs=[pl.BlockSpec((256, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((256, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(p)
        timeit("copy", copy_step)

    if "mmonly" in variants:
        # Matmul-only: out = split product, no P input — write DMA + MXU.
        dn = (((0,), (0,)), ((), ()))

        def mm_kernel(a_ref, al_ref, b_ref, bl_ref, o_ref):
            o_ref[:, :] = panel_dot_split(
                a_ref[:, :], al_ref[:, :], b_ref[:, :], bl_ref[:, :],
                dn, mode="split3")

        def mm_step(p):
            out = pl.pallas_call(
                mm_kernel,
                out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
                grid=(d // 256,),
                in_specs=[
                    pl.BlockSpec((rm, 256), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rm, 256), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rm, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((rm, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((256, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(vth, vtl, vbh, vbl)
            return p + 0.0 * out[0, 0]
        timeit("mmonly", mm_step)

    if "stack3" in variants or "stack4" in variants:
        # Fold the split cross terms into ONE matmul along K: the MXU
        # accumulates internally, removing the per-step f32 adds and
        # product temps of the multi-dot form.
        a3 = jnp.concatenate([vth, vth, vtl], axis=0)       # (3rm, D)
        b3 = jnp.concatenate([vbh, vbl, vbh], axis=0)
        a4 = jnp.concatenate([vth, vtl], axis=0)            # (2rm, D)
        b4 = jnp.concatenate([vbh, vbl], axis=0)
        dn = (((0,), (0,)), ((), ()))

        def stacked_kernel(p_ref, a_ref, b_ref, o_ref):
            o_ref[:, :] = p_ref[:, :] + jax.lax.dot_general(
                a_ref[:, :], b_ref[:, :], dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        def make_stacked(aS, bS):
            km = aS.shape[0]

            def step(p):
                return pl.pallas_call(
                    stacked_kernel,
                    out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
                    grid=(d // 256,),
                    in_specs=[
                        pl.BlockSpec((256, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((km, 256), lambda i: (0, i), memory_space=pltpu.VMEM),
                        pl.BlockSpec((km, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((256, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                )(p, aS, bS)
            return step

        if "stack3" in variants:
            timeit("stack3", make_stacked(a3, b3))
        if "stack4" in variants:
            timeit("stack4", make_stacked(a4, b4))

    if "v0" in variants:
        timeit("v0", lambda p: rank_update_t(p, vt, b, mode="split3"))
    if "tr128" in variants:
        timeit("tr128", make_variant(128, "std"))
    if "tr256" in variants:
        timeit("tr256", make_variant(256, "std"))
    if "accum" in variants:
        timeit("accum", make_variant(256, "accum"))
    if "arb" in variants:
        timeit("arb", make_variant(256, "std", arb=True))
    if "grid2d" in variants:
        timeit("grid2d", make_variant(256, "std", tc=1152))


if __name__ == "__main__":
    main(sys.argv[1:] or ["v0", "tr128", "tr256", "accum", "arb", "grid2d"])
