"""Predicted multi-chip scaling efficiency for the sharded EKF at 10k+ lm.

Single-chip hardware cannot measure multi-chip wall-clock, so this combines
three MEASURED/AUDITED quantities into an analytic roofline prediction
(BASELINE.json target: >= 0.8 scaling efficiency at 10k+ landmarks):

  1. audited per-frame collective bytes from the compiled HLO of the real
     dist_ekf frame step (benchmarks/audit_collectives.py at the 10k-lm
     shape) — all-gather of the (m, D) whitened-gain strip dominates;
  2. the measured single-chip frame decomposition at the bench shape
     (benchmarks/bench_framestep.py): frame time = serial tail (chain,
     sweep, glue, dispatch) + the O(D^2) P panel pass at HBM speed;
  3. published v5e link speeds: HBM ~8.1e11 B/s; ICI 4.5e10 B/s per link
     per direction, one 1D ring axis used by the state sharding (9e10 B/s
     bidirectional).

Model per frame on N chips (row-block-sharded P):

  t(N) = t_serial + (2 * 4 D^2 / N) / W_hbm + t_comm(N)
  t_comm(N) = ag_bytes * (N-1)/N / W_ici + 2 * ar_bytes / W_ici
  efficiency(N) = t(1) / (N * t(N))

Three wire scenarios: unidirectional ring (pessimistic), bidirectional ring,
and bidirectional with collective/compute overlap (XLA emits async
all-gather-start/done on TPU; the strip all-gather can stream ahead of the
panel consumption) — t_comm then hides under the HBM pass up to max().

Run: python benchmarks/scaling_model.py [--audit]  (CPU; --audit re-runs the
HLO audits instead of using the recorded constants below).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- audited constants (AUDIT_LANDMARKS=10240 AUDIT_OBS=64, 2026-08-21) ---
D_10K = 20736            # padded state dim at 10,240 landmarks
AG_BYTES = 11_155_968    # all-gather bytes/frame, f32 gain wire
AG_BYTES_I16 = 5_474_304  # all-gather bytes/frame, i16 gain wire (halved)
AR_BYTES = 316_500       # all-reduce bytes/frame (partial S, innovations)
M_ROWS = 128             # stacked measurement rows (2 * 64)

# --- measured single-chip decomposition (bench_framestep, round 5) ---
# Serial tail = chain dispatch measured standalone at D=2304 ("chainonly"
# 53 us at nv=64 incl. its streaming grid; the dist kernel's replicated
# chain work is the same O(m^2 + m*Dp/N-free) algebra and the old 140-us
# XLA chol+triangular chain is replaced by the sweep since round 5).
T_SERIAL = 60e-6         # frame minus the P panel pass: chain + sweep + glue
HBM_BW = 8.1e11          # v5e HBM bytes/s (datasheet; conservative)
ICI_LINK = 4.5e10        # v5e ICI bytes/s per link per direction


def run_audit(n_dev: int, landmarks: int = 10240):
    env = dict(os.environ, AUDIT_DEVICES=str(n_dev),
               AUDIT_LANDMARKS=str(landmarks), AUDIT_OBS="64")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "audit_collectives.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    ag = sum(int(x.replace(",", "")) for x in
             re.findall(r"all-gather: ([\d,]+) B", out))
    ar = sum(int(x.replace(",", "")) for x in
             re.findall(r"all-reduce: ([\d,]+) B", out))
    m = re.search(r"AUDIT_RESULT total_bytes=(\d+) dp=(\d+)", out)
    return ag, ar, int(m.group(2))


def model(d, ag, ar, n, wire="bidir", overlap=False):
    t_hbm = 2 * 4 * d * d / n / HBM_BW
    w = ICI_LINK * (2.0 if wire == "bidir" else 1.0)
    t_comm = 0.0 if n == 1 else (ag * (n - 1) / n / w + 2 * ar / w)
    if overlap:
        return T_SERIAL + max(t_hbm, t_comm)
    return T_SERIAL + t_hbm + t_comm


def main():
    d, ar = D_10K, AR_BYTES
    wires = {"f32": AG_BYTES, "i16": AG_BYTES_I16}
    if "--audit" in sys.argv:
        for mode in ("f32", "i16"):
            os.environ["AUDIT_GAIN_WIRE"] = mode
            ag8, ar8, d = run_audit(8)
            for n_dev in (16, 32):
                agn, arn, _ = run_audit(n_dev)
                assert (ag8, ar8) == (agn, arn), (
                    "collective output bytes must be mesh-size independent",
                    n_dev, (ag8, ar8), (agn, arn))
            wires[mode] = ag8
            ar = ar8
    print(f"# Scaling-efficiency prediction, 10,240 landmarks "
          f"(D={d}, m={M_ROWS})")
    print(f"# audited: all-gather f32 {wires['f32']:,} / i16 "
          f"{wires['i16']:,} B/frame, all-reduce {ar:,} B/frame")
    print(f"# model: t_serial={T_SERIAL*1e6:.0f}us, HBM {HBM_BW:.2g} B/s, "
          f"ICI {ICI_LINK:.2g} B/s/link/dir")
    t1 = model(d, wires["f32"], ar, 1)
    print(f"# single chip: {t1*1e3:.2f} ms/frame "
          f"({6/t1:,.0f} control steps/s)")
    for wire_mode, ag in wires.items():
        print(f"\n## gain wire = {wire_mode} "
              f"({'cfg.dist_gain_wire' if wire_mode == 'i16' else 'default'})")
        print("| chips | unidir no-overlap | bidir no-overlap | "
              "bidir overlap | steps/s (bidir+overlap) |")
        print("|---|---|---|---|---|")
        for n in (2, 4, 8, 16, 32):
            effs = []
            for wire, ov in (("uni", False), ("bidir", False),
                             ("bidir", True)):
                tn = model(d, ag, ar, n, wire, ov)
                effs.append(t1 / (n * tn))
            tn = model(d, ag, ar, n, "bidir", True)
            print(f"| {n} | {effs[0]:.2f} | {effs[1]:.2f} | {effs[2]:.2f} | "
                  f"{6/tn:,.0f} |")


if __name__ == "__main__":
    main()
