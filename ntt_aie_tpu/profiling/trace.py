"""Trace capture — the TPU analog of the reference's hardware trace path.

Reference pipeline: event0/event1 markers in the kernel
(src/aie_core.cc:129-131), packet-switched trace routing (src/aie2.py:156-158),
host dump (src/test.cpp:193-198), offline decode to Chrome JSON
(scripts/parse_trace.py). On TPU the hardware already streams an op-level
trace through jax.profiler/XProf, so the rebuild is thin:

- ``kernel_markers`` — jax.named_scope context, the event0/event1 analog:
  brackets a region so its ops group under one label in the trace viewer.
- ``capture_trace`` — run a callable under jax.profiler.trace and return the
  artifact directory (TensorBoard xplane; open with xprof/tensorboard).
- ``summarize_trace`` — offline decode (the parse_trace.py analog): read
  the captured Chrome-JSON trace back and reduce to per-op device-time
  totals.
- ``marker_pair_times`` — fallback kernel-time measurement when the
  profiler cannot see through a tunneled backend: per-kernel dependent
  dispatch chains with readback fences (utils/timing.py methodology),
  reported in the same per-op rows as summarize_trace.
"""

from __future__ import annotations

import contextlib
import glob
import os
import tempfile
from typing import Callable, Optional


@contextlib.contextmanager
def kernel_markers(label: str):
    """Named-scope marker pair bracketing a traced region (event0/event1
    analog; reference src/aie2.py:168,316)."""
    import jax

    with jax.named_scope(label):
        yield


def capture_trace(fn: Callable, *args, trace_dir: Optional[str] = None,
                  warmup: bool = True) -> str:
    """Run ``fn(*args)`` under the JAX profiler; return the trace directory.

    The result is blocked on inside the traced region so device execution is
    captured, not just dispatch.
    """
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="ntt_trace_")
    if warmup:
        _block(fn(*args))
    with jax.profiler.trace(trace_dir):
        _block(fn(*args))
    return trace_dir


def _block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return out


def find_chrome_trace(trace_dir: str) -> Optional[str]:
    hits = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    return hits[-1] if hits else None


def marker_pair_times(fns: dict, *, iters: int = 20,
                      repeats: int = 3) -> list[dict]:
    """Fallback kernel-time measurement for backends where the profiler
    cannot observe device execution (e.g. a tunneled TPU): per-kernel
    dependent dispatch chains with readback fences — the trustworthy
    equivalent of the reference's event0/event1 marker pairs
    (profile/plot_kerneltime.py:25-37) on this platform; see
    utils/timing.py for why block_until_ready is not a fence here.

    fns: {label: (callable, example_input)} with shape-preserving
    callables. Returns rows shaped like summarize_trace's output:
    [{"op", "total_us", "count", "us_per_call"}].
    """
    from ntt_aie_tpu.utils.timing import time_device

    rows = []
    for label, (fn, x) in fns.items():
        res = time_device(fn, x, iters=iters, repeats=repeats)
        rows.append({
            "op": label,
            "us_per_call": res["us_per_iter"],
            "total_us": res["us_per_iter"] * iters,
            "count": iters,
        })
    return rows


def summarize_trace(trace_dir: str, top: int = 20) -> list[dict]:
    """Per-op device-time summary from a captured trace — the offline-decode
    step (scripts/parse_trace.py reduces raw HW packets to Chrome JSON; the
    TPU profiler already emits Chrome JSON, so the decode reduces it to
    per-op totals on the device process only). Returns [] if no trace."""
    import gzip
    import json

    path = find_chrome_trace(trace_dir)
    if path is None:
        return []
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device" in e.get("args", {}).get("name", "")
    }
    totals: dict[str, list] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            rec = totals.setdefault(e["name"], [0.0, 0])
            rec[0] += e.get("dur", 0.0)
            rec[1] += 1
    out = [
        {"op": k, "total_us": v[0], "count": v[1]}
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1][0])
    ]
    return out[:top]
