"""Kernel microbenchmarks: Pallas fused rank-update/downdate vs XLA.

Run on TPU: python benchmarks/bench_kernels.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from conan_slam_tpu.ops.pallas_update import (
        rank_update_downdate, rank_update_downdate_reference)

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    for d in (1024, 2048, 4096, 8192):
        r, m = 20, 64
        p = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(d, r)).astype(np.float32))
        b = jnp.eye(r, dtype=jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32))

        f_ref = jax.jit(rank_update_downdate_reference)
        f_pal = jax.jit(rank_update_downdate)
        for name, f in (("xla", f_ref), ("pallas", f_pal)):
            out = f(p, v, b, w1); np.asarray(out)      # warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(p, v, b, w1)
                np.asarray(out[0, :8])                  # fence
                ts.append(time.perf_counter() - t0)
            best = min(ts)
            gb = (2 * d * d * 4 + 2 * d * (r + m) * 4) / 1e9
            print(f"D={d:5d} {name:6s}: {best*1e3:7.3f} ms  "
                  f"({gb/best:6.1f} GB/s effective)")

if __name__ == "__main__":
    main()
