"""TPU smoke test for ops.frame_kernel.frame_update at bench shape.

Compiles + runs the one-dispatch whole-frame kernel at D=2304 / MP=128 on the
real chip and checks it against the jnp reference algebra computed on CPU.

Run: python benchmarks/smoke_frame_update.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from conan_slam_tpu.ops.frame_kernel import frame_update

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(5)
    d, nz, nb = 2304, 64, 20
    mp = 128
    a = rng.normal(size=(d, 16)).astype(np.float32)
    p = (a @ a.T / d + np.eye(d, dtype=np.float32)).astype(np.float32)
    slots = rng.choice((d - 3) // 2, size=nz, replace=False).astype(np.int32)
    rows = np.concatenate(
        [np.arange(3), (3 + 2 * slots[:, None] + np.arange(2)).reshape(-1)]
    ).astype(np.int32)
    hc = rng.normal(size=(mp, rows.size)).astype(np.float32) * 0.1
    b = rng.normal(size=(nb, nb)).astype(np.float32) * 0.1
    bmat = 0.5 * (b + b.T)
    vtf = rng.normal(size=(nb, d)).astype(np.float32) * 0.02
    rmat = np.eye(mp, dtype=np.float32) * 1.5
    v = rng.normal(size=mp).astype(np.float32) * 0.1

    args = tuple(jnp.asarray(x) for x in (p, rows, hc, bmat, vtf, rmat, v))
    fn = jax.jit(lambda *a: frame_update(*a))
    t0 = time.perf_counter()
    out = fn(*args)
    got_p = np.asarray(out.p)
    got_dx = np.asarray(out.dx)
    got_nis = float(np.asarray(out.nis))
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Reference in float64 numpy (host-side; avoids eager TPU dispatch).
    p64 = p.astype(np.float64)
    hc64 = hc.astype(np.float64)
    vtf64 = vtf.astype(np.float64)
    bm64 = bmat.astype(np.float64)
    prows = p64[rows]
    pht = hc64 @ prows + (hc64 @ vtf64[:, rows].T) @ bm64 @ vtf64
    s = pht[:, rows] @ hc64.T + rmat.astype(np.float64)
    si = np.linalg.inv(s)
    siv = v.astype(np.float64) @ si
    ref_dx = siv @ pht
    ref_nis = float(siv @ v)
    ref_p = p64 + vtf64.T @ (bm64 @ vtf64) - pht.T @ (si @ pht)
    perr = np.max(np.abs(got_p - ref_p)) / max(1e-9, np.max(np.abs(ref_p)))
    dxerr = np.max(np.abs(got_dx - ref_dx))
    niserr = abs(got_nis - ref_nis) / max(1e-9, abs(ref_nis))
    print(f"P rel err {perr:.2e}  dx abs err {dxerr:.2e}  nis rel {niserr:.2e}")
    # f32 kernel vs f64 reference: the sweep-based S^-1 dominates the error
    # (exact f32 path-equivalence is covered by tests/test_pallas_ops.py in
    # interpret mode); 5e-3 relative-to-max bounds a healthy f32 chain.
    ok = perr < 5e-3 and dxerr < 1e-3 and niserr < 1e-3
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
