"""Regenerate profile/scaling_virtual_r2.json (DESIGN.md §4 table).

Runs every (config, device-count) CELL in its own subprocess: the XLA CPU
backend aborts the whole process when oversubscribed virtual-device
threads miss its hard 40 s collective-rendezvous window, and per-cell
isolation records the cells that do complete instead of losing the run.
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
    "here - the overlap win is an ICI property (DESIGN.md par.4). Cells "
    "where this host could not get all device threads into the "
    "collective inside the CPU backend's hard 40 s rendezvous window "
    "are recorded as failed. Efficiency is relative to each config's "
    "D=1 cell."
)

CONFIGS = [
    {"log_n": 20, "label": "fourstep_monolithic", "topology": "fourstep"},
    {"log_n": 16, "label": "fourstep_monolithic", "topology": "fourstep"},
    {"log_n": 16, "label": "pairwise_reference_topology",
     "topology": "pairwise"},
]

CELL = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ntt_aie_tpu.fields import P_469762049
from ntt_aie_tpu.profiling.scaling import run_scaling
log_n, topology, devices = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
rows = run_scaling(P_469762049, log_n, [devices], topology=topology,
                   engine="xla", iters=3)
print("CELL=" + json.dumps(rows[0]))
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else (
        "profile/scaling_virtual_r2.json")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_PLATFORMS="cpu")
    configs = []
    for cfg in CONFIGS:
        rows, base = [], None
        for d in (1, 2, 4, 8):
            proc = subprocess.run(
                [sys.executable, "-c", CELL, str(cfg["log_n"]),
                 cfg["topology"], str(d)],
                capture_output=True, text=True, timeout=600, env=env)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("CELL=")), None)
            if proc.returncode != 0 or line is None:
                rows.append({"devices": d, "log_n": cfg["log_n"],
                             "failed": "collective rendezvous timeout / "
                                       "backend abort"})
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
