"""Two-process jax.distributed smoke: the multi-host (DCN) software path.

Single-chip hardware cannot exercise real cross-host collectives, but the
multi-process SOFTWARE path — coordinator bring-up, global device
enumeration, cross-process array placement, and collectives spanning
processes — is exactly what a real pod run adds on top of the virtual-mesh
tests (SURVEY.md section 5: "multi-host runs need standard JAX coordinator
semantics").  This script runs the sharded EKF frame kernel
(parallel.dist_fastframe) on a mesh spanning TWO OS processes x 4 virtual
CPU devices each, with the coordinator on localhost:

  parent:   spawns 2 children, collects their verdicts, writes
            DCN_SMOKE.json (a MULTICHIP-style artifact).
  children: jax.distributed.initialize(...), build the 8-device global
            mesh, place the sharded state across processes, run one full
            sharded frame (f32 AND i16 gain wire), and check the
            replicated outputs (NIS, pose trace) against the single-device
            fused-frame reference computed locally.

Run: python benchmarks/dcn_smoke.py          (parent; ~1 min)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("DCN_SMOKE_PORT", "52421"))
N_PROC = 2
LOCAL_DEVICES = 4


def child(proc_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from conan_slam_tpu.filters import ekf
    from conan_slam_tpu.filters.common import CompactObs
    from conan_slam_tpu.filters.ekf.fastframe import frame_factors
    from conan_slam_tpu.filters.ekf.update import fused_frame_update
    from conan_slam_tpu.models import sensor
    from conan_slam_tpu.parallel import dist_ekf, dist_fastframe
    from conan_slam_tpu.parallel.mesh import STATE_AXIS, make_mesh

    n_global = N_PROC * LOCAL_DEVICES
    assert len(jax.devices()) == n_global, jax.devices()
    assert jax.process_count() == N_PROC
    mesh = make_mesh({STATE_AXIS: n_global})

    # Deterministic problem, identical on both processes.
    rng = np.random.default_rng(4)
    cap = 30
    d = 3 + 2 * cap
    feats = rng.uniform(-500, 500, size=(cap, 2)).astype(np.float32)
    state = ekf.init_state(cap, 40)
    x0 = np.zeros((d,), np.float32)
    x0[:3] = [5.0, -2.0, 0.4]
    x0[3:] = feats.reshape(-1)
    a = rng.normal(size=(d, d)).astype(np.float32) * 0.05
    p0 = a @ a.T + np.eye(d, dtype=np.float32) * 0.1
    state = state._replace(x=jnp.asarray(x0), p=jnp.asarray(p0),
                           n_active=jnp.int32(cap))

    q = jnp.asarray(np.diag([0.18, 0.0006]).astype(np.float32))
    r = jnp.asarray(np.diag([0.08, 0.0024]).astype(np.float32))
    s_steps = 6
    vns = jnp.asarray(80.0 + rng.normal(size=(s_steps,)).astype(np.float32))
    swans = jnp.asarray(rng.normal(size=(s_steps,)).astype(np.float32) * 0.03)
    phis = jnp.asarray(
        0.4 + np.cumsum(rng.normal(size=(s_steps,)).astype(np.float32) * 0.005)
    )
    act = jnp.ones((s_steps,), bool)
    nz = 5
    zp, _, _ = sensor.observe(state.pose, jnp.asarray(feats[:nz]))
    z = jnp.asarray(
        np.asarray(zp)
        + rng.normal(size=(nz, 2)).astype(np.float32) * [0.3, 0.01]
    )
    slots = jnp.arange(nz, dtype=jnp.int32)
    mask = jnp.ones((nz,), bool)
    sigma_h = 0.000175

    # Single-device reference (local, no collectives).
    st1, pt_ref, vmat, bmat = frame_factors(
        state, vns, swans, phis, act, q, 73.0, 0.01, sigma_h, True
    )
    obs = CompactObs(z=z, ids=slots, mask=mask)
    ref, nis_ref = fused_frame_update(
        st1, vmat, bmat, obs, slots, mask, r, use_pallas=False,
        return_nis=True,
    )

    # Cross-process sharded state + one full frame per wire format.
    xs, ps = dist_ekf.shard_state(mesh, state.x, state.p)
    for wire in ("f32", "i16"):
        run = jax.jit(
            lambda xs, ps, wire=wire: dist_fastframe.sharded_frame_update(
                mesh, xs, ps, vns, swans, phis, act, q, z, slots, mask, r,
                73.0, 0.01, sigma_h, True, gain_wire=wire,
            )
        )
        xs2, ps2, nis2, pt2 = run(xs, ps)
        jax.block_until_ready((xs2, ps2))
        np.testing.assert_allclose(
            float(nis2), float(nis_ref), rtol=1e-3,
            err_msg=f"nis mismatch (wire={wire})",
        )
        np.testing.assert_allclose(
            np.asarray(pt2), np.asarray(pt_ref), rtol=1e-4, atol=1e-4,
            err_msg=f"pose trace mismatch (wire={wire})",
        )
    print(
        f"DCN_CHILD_OK proc={proc_id} processes={jax.process_count()} "
        f"global_devices={len(jax.devices())} "
        f"local_devices={len(jax.local_devices())}",
        flush=True,
    )


def parent() -> None:
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROC)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and all(
        "DCN_CHILD_OK" in o for o in outs
    )
    for i, o in enumerate(outs):
        tail = "\n".join(o.strip().splitlines()[-3:])
        print(f"--- child {i} (rc={procs[i].returncode}) ---\n{tail}",
              file=sys.stderr, flush=True)
    artifact = {
        "ok": ok,
        "processes": N_PROC,
        "local_devices_per_process": LOCAL_DEVICES,
        "global_devices": N_PROC * LOCAL_DEVICES,
        "kernel": "dist_fastframe.sharded_frame_update (f32 + i16 gain wire)",
        "checks": "NIS + pose trace vs single-device fused frame (rtol 1e-3/1e-4)",
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DCN_SMOKE.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--proc" in sys.argv:
        child(int(sys.argv[sys.argv.index("--proc") + 1]))
    else:
        parent()
