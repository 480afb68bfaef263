"""Pallas kernel tests (interpreter mode on CPU; exact on-chip math is the
same program compiled by Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

from conan_slam_tpu.ops.pallas_update import (
    rank_update_downdate,
    rank_update_downdate_reference,
)


def test_rank_update_downdate_matches_reference():
    rng = np.random.default_rng(0)
    d, r, m = 256, 20, 64
    p = rng.normal(size=(d, d)).astype(np.float32)
    p = p @ p.T
    v = rng.normal(size=(d, r)).astype(np.float32)
    b = rng.normal(size=(r, r)).astype(np.float32)
    b = 0.5 * (b + b.T)
    w1 = rng.normal(size=(d, m)).astype(np.float32)
    ref = rank_update_downdate_reference(
        jnp.asarray(p), jnp.asarray(v), jnp.asarray(b), jnp.asarray(w1)
    )
    out = rank_update_downdate(
        jnp.asarray(p), jnp.asarray(v), jnp.asarray(b), jnp.asarray(w1),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-3)


def test_rank_update_downdate_non_tileable_falls_back():
    rng = np.random.default_rng(1)
    d, r, m = 67, 4, 8   # not a multiple of 128 -> jnp fallback path
    p = rng.normal(size=(d, d)).astype(np.float32)
    v = rng.normal(size=(d, r)).astype(np.float32)
    b = np.eye(r, dtype=np.float32)
    w1 = rng.normal(size=(d, m)).astype(np.float32)
    out = rank_update_downdate(
        jnp.asarray(p), jnp.asarray(v), jnp.asarray(b), jnp.asarray(w1),
        interpret=True,
    )
    ref = p + v @ b @ v.T - w1 @ w1.T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
