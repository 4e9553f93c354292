"""Device timing harness.

The reference measures two things (SURVEY.md §6): host wall-clock per
dispatch (src/test.cpp:157-175, trimmed mean of 10) and on-device kernel
time from hardware trace marker pairs (profile/plot_kerneltime.py:25-37).

On a TPU reached through an RPC tunnel, per-dispatch host timing is
dominated by transport noise, and — measured on the axon backend —
``block_until_ready`` is NOT an execution fence: an "async stream" of
batch-128 n=2^20 transforms timed with block_until_ready implied 14 TB/s
of HBM traffic on an 819 GB/s part. The only fence that provably waits for
device execution is a *readback* that depends on the result.

The trustworthy equivalent of the reference's marker-pair metric is
therefore a *dependent dispatch chain with a readback fence*: issue ITERS
dispatches where each consumes the previous output (y = fn(y)), then
device_get a tiny slice of the final output, divide. Data dependence stops
XLA from eliding work; the slice readback forces the whole chain to have
executed; its ~ms tunnel latency amortizes over ITERS.

``time_device`` returns (seconds_per_iter, result) plus the trimmed-mean
host-dispatch numbers for completeness, mirroring both reference metrics.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fence(out) -> None:
    """True execution fence: device_get a tiny slice of EVERY array leaf.

    block_until_ready is not sufficient on tunneled backends (see module
    docstring); a readback is the only wait that provably covers device
    execution. Independent leaves (e.g. a list of separate chains) each
    need their own readback — fencing only the first would stop the clock
    while the later-enqueued chains still run. All slices go through one
    device_get call (a single round trip)."""
    slices = [
        leaf.ravel()[:8]
        for leaf in jax.tree_util.tree_leaves(out)
        if hasattr(leaf, "ravel")
    ]
    if slices:
        jax.device_get(slices)


def chain_loop(fn, iters: int):
    """x -> fn applied `iters` times, dependently, as eager dispatches.

    Deliberately NOT a lax.fori_loop: eager dispatches pipeline on the
    queue, and the dependent chain + readback fence measures the same
    device time without retrace/loop-carry constraints on fn."""

    def run(x):
        for _ in range(iters):
            x = fn(x)
        return x

    return run


def time_device(fn, x, *, iters: int = 100, repeats: int = 5) -> dict:
    """Time fn on device via a dependent dispatch chain + readback fence.

    Requires fn's output to be shape/dtype compatible with its input
    (true for fwd and inv NTTs on flat uint32 vectors).
    Returns dict(us_per_iter, best_us, runs_us, result).
    """
    run = chain_loop(fn, iters)
    out = run(x)
    fence(out)  # compile + warm
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(x)
        fence(out)
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
    fence(jfn(x))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(jfn(x))
        ts.append((time.perf_counter() - t0) * 1e6)
    ts_sorted = sorted(ts)
    trimmed = ts_sorted[1:-1] if len(ts_sorted) > 2 else ts_sorted
    return {"us_trimmed_mean": float(np.mean(trimmed)), "runs_us": ts}
