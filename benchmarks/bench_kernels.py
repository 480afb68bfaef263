"""Kernel microbenchmarks: Pallas fused rank-update/downdate vs XLA.

Run on TPU: python benchmarks/bench_kernels.py

Measurement note: on the remote (axon) backend a single dispatched program
pays ~30 ms of round-trip latency, so each timed call chains ITERS kernel
applications on device and reports per-application time.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

ITERS = 50


def main():
    import jax
    import jax.numpy as jnp

    from conan_slam_tpu.ops.pallas_update import (
        rank_update_t,
        rank_update_t_reference,
    )

    def rank_update_downdate_reference(p, v, b, w1):
        return rank_update_t_reference(p, v.T, b) - w1 @ w1.T

    def rank_update_downdate(p, v, b, w1):
        # Fold the downdate strip into the middle matrix: [V W1] diag(B, -I).
        r, m = v.shape[1], w1.shape[1]
        vt = jnp.concatenate([v.T, w1.T], axis=0)
        bb = jnp.zeros((r + m, r + m), p.dtype)
        bb = bb.at[:r, :r].set(b)
        bb = bb.at[r:, r:].set(-jnp.eye(m, dtype=p.dtype))
        return rank_update_t(p, vt, bb)

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    for d in (1024, 2051, 4096, 8192):
        r, m = 20, 64
        p = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(d, r)).astype(np.float32) * 1e-3)
        b = jnp.eye(r, dtype=jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32) * 1e-3)

        def chained(fn):
            @jax.jit
            def run(p, v, b, w1):
                def body(i, p):
                    return fn(p, v, b, w1)

                return jax.lax.fori_loop(0, ITERS, body, p)

            return run

        f_ref = chained(rank_update_downdate_reference)
        f_pal = chained(rank_update_downdate)
        for name, f in (("xla", f_ref), ("pallas", f_pal)):
            np.asarray(f(p, v, b, w1)[0, :4])           # warm + fence
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(p, v, b, w1)[0, :4])
                ts.append(time.perf_counter() - t0)
            per_app = min(ts) / ITERS
            gb = (2 * d * d * 4 + 2 * d * (r + m) * 4) / 1e9
            print(
                f"D={d:5d} {name:6s}: {per_app * 1e6:9.1f} us/app "
                f"({gb / per_app:7.1f} GB/s effective)",
                flush=True,
            )


if __name__ == "__main__":
    main()
