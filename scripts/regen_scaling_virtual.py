"""Regenerate profile/scaling_virtual_r3.json (DESIGN.md §4 table).

Runs every (config, device-count) CELL in its own subprocess: the XLA CPU
backend aborts the whole process when oversubscribed virtual-device
threads miss its collective-rendezvous window, and per-cell isolation
records the cells that do complete instead of losing the run. The
rendezvous window itself is raised via
--xla_cpu_collective_{call_terminate_,}timeout_seconds=600 — on this
1-core host the 8 spinning participant threads starve each other through
the default 40 s window exactly at D=8 (round-2's missing cells); with
the raised window every D=8 cell completes in seconds.
Run with the machine otherwise idle — these are relative CPU numbers and
contention skews the small-D cells first.

Usage: python scripts/regen_scaling_virtual.py [out.json]
"""

import json
import os
import subprocess
import sys

NOTE = (
    "8 VIRTUAL CPU devices (structure/correctness harness; absolute "
    "numbers are not TPU performance). CPU collectives are synchronous "
    "rendezvous, so overlap_chunks>1 only adds per-collective overhead "
    "here - the overlap win is an ICI property (DESIGN.md par.4). The "
    "CPU backend's default 40 s rendezvous window is raised to 600 s "
    "(--xla_cpu_collective_call_terminate_timeout_seconds): with 8 "
    "spin-waiting participant threads on this 1-core host the D=8 "
    "cells starved past the default window (round-2 holes); they "
    "complete in seconds once allowed to. Efficiency is relative to "
    "each config's D=1 cell."
)

CONFIGS = [
    {"log_n": 16, "label": "fourstep_monolithic", "topology": "fourstep",
     "chunks": 1},
    {"log_n": 16, "label": "fourstep_overlap_c4", "topology": "fourstep",
     "chunks": 4},
    {"log_n": 16, "label": "pairwise_reference_topology",
     "topology": "pairwise", "chunks": 1},
    {"log_n": 20, "label": "fourstep_monolithic", "topology": "fourstep",
     "chunks": 1},
    {"log_n": 20, "label": "fourstep_overlap_c4", "topology": "fourstep",
     "chunks": 4},
]

CELL = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ntt_aie_tpu.fields import P_469762049
from ntt_aie_tpu.profiling.scaling import run_scaling
log_n, topology, devices, chunks = (int(sys.argv[1]), sys.argv[2],
                                    int(sys.argv[3]), int(sys.argv[4]))
rows = run_scaling(P_469762049, log_n, [devices], topology=topology,
                   engine="xla", iters=3, overlap_chunks=chunks)
print("CELL=" + json.dumps(rows[0]))
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else (
        "profile/scaling_virtual_r3.json")
    env = dict(
        os.environ,
        XLA_FLAGS=(
            "--xla_force_host_platform_device_count=8 "
            "--xla_cpu_collective_call_terminate_timeout_seconds=600 "
            "--xla_cpu_collective_timeout_seconds=600"),
        JAX_PLATFORMS="cpu")
    configs = []
    for cfg in CONFIGS:
        rows, base = [], None
        for d in (1, 2, 4, 8):
            proc = subprocess.run(
                [sys.executable, "-c", CELL, str(cfg["log_n"]),
                 cfg["topology"], str(d), str(cfg["chunks"])],
                capture_output=True, text=True, timeout=900, env=env)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("CELL=")), None)
            if proc.returncode != 0 or line is None:
                rows.append({"devices": d, "log_n": cfg["log_n"],
                             "failed": f"rc={proc.returncode}"})
                print(f"{cfg['label']} 2^{cfg['log_n']} D={d}: FAILED")
                continue
            row = json.loads(line[len("CELL="):])
            if base is None:
                base = row["us_per_ntt"]
            row["efficiency"] = round(
                base / (row["us_per_ntt"] * d), 4) if base else None
            rows.append(row)
            print(f"{cfg['label']} 2^{cfg['log_n']} D={d}: "
                  f"{row['us_per_ntt']:.1f} us/NTT "
                  f"eff={row['efficiency']}")
        configs.append({"log_n": cfg["log_n"], "label": cfg["label"],
                        "rows": rows})
    payload = {"note": NOTE, "configs": configs}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
