"""Device timing harness.

The reference measures two things (SURVEY.md §6): host wall-clock per
dispatch (src/test.cpp:157-175, trimmed mean of 10) and on-device kernel
time from hardware trace marker pairs (profile/plot_kerneltime.py:25-37).

On a TPU reached through an RPC tunnel, per-dispatch host timing is
dominated by transport noise (observed: sync-wait quantization ~30 ms,
pipelined-queue artifacts). The trustworthy equivalent of the reference's
marker-pair metric is *device-side iteration*: chain ITERS dependent
executions of the function inside one jitted lax.fori_loop, time the single
dispatch end to end, divide. Data dependence between iterations stops XLA
from eliding work; the loop body re-consumes its own output.

``time_device`` returns (seconds_per_iter, result) plus the trimmed-mean
host-dispatch numbers for completeness, mirroring both reference metrics.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def chain_loop(fn, iters: int):
    """jit(x -> fn applied `iters` times, dependently)."""

    @jax.jit
    def run(x):
        def body(_, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, iters, body, x)

    return run


def time_device(fn, x, *, iters: int = 100, repeats: int = 5) -> dict:
    """Time fn on device via a chained fori_loop.

    Requires fn's output to be shape/dtype compatible with its input
    (true for fwd and inv NTTs on flat uint32 vectors).
    Returns dict(us_per_iter, best_us, runs_us, result).
    """
    run = chain_loop(fn, iters)
    out = run(x)
    out.block_until_ready()  # compile + warm
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(x)
        out.block_until_ready()
        runs.append((time.perf_counter() - t0) / iters * 1e6)
    runs_sorted = sorted(runs)
    # trimmed mean, reference-style (drop min and max; plot_exectime.py:27-29)
    trimmed = runs_sorted[1:-1] if len(runs_sorted) > 2 else runs_sorted
    return {
        "us_per_iter": float(np.mean(trimmed)),
        "best_us": runs_sorted[0],
        "runs_us": runs,
        "result": out,
    }


def time_host_dispatch(fn, x, *, runs: int = 10) -> dict:
    """The reference's host E2E metric: wall clock around one dispatch+wait,
    `runs` times, trimmed mean (src/test.cpp:157-175 + plot_exectime.py:27-29).
    On tunneled devices this measures transport, not the chip — reported
    for parity, not for optimization decisions."""
    jfn = jax.jit(fn)
    jfn(x).block_until_ready()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jfn(x).block_until_ready()
        ts.append((time.perf_counter() - t0) * 1e6)
    ts_sorted = sorted(ts)
    trimmed = ts_sorted[1:-1] if len(ts_sorted) > 2 else ts_sorted
    return {"us_trimmed_mean": float(np.mean(trimmed)), "runs_us": ts}
