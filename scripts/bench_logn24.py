"""Single-chip n = 2^24 forward NTT on the real TPU (north-star size).

The reference's largest measured size is 2^13 (SURVEY.md §6); this runs
the four-step Pallas plan at 2^24 (4096 x 4096 split, factored twiddles
so no 2 x 134 MB matrix build/upload) end to end on one chip, gated
bit-exact against the native C++ oracle, and prints one JSON line.

Run: python scripts/bench_logn24.py [B] [fwd|inv]

inv times the inverse pass on spectral inputs and gates on the device
roundtrip inv(fwd(a)) == a (row 0).
"""
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntt_aie_tpu.utils.platform import honor_platform_env
honor_platform_env()

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    from ntt_aie_tpu import NTTConfig, P_469762049 as field
    from ntt_aie_tpu import twiddles as tw
    from ntt_aie_tpu.plan import build_plan
    from ntt_aie_tpu.utils.timing import time_device

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    op = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    assert op in ("fwd", "inv", "stream")
    log_n = 24
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n, rows_log2=12)
    plan = build_plan(cfg, engine="pallas", wmat_factored=True)

    rng = np.random.default_rng(0)
    a = rng.integers(0, field.p, n).astype(np.uint32)

    if op == "stream":
        # Past the HBM wall (VERDICT round-3 item 6): resident B=64 is
        # RESOURCE_EXHAUSTED (in+out alone 8 GB), so bulk batches run as
        # overlapping sub-batches through utils/streaming.stream_transform
        # — upload(k+1) / compute(k) / download(k-1) ride a depth-2
        # in-flight queue, the reference's FIFO overlap at a scale it
        # never reached (src/aie2.py:28). Throughput is honest wall clock
        # over the whole stream INCLUDING host<->device transfers (the
        # tunnel makes those expensive; the JSON records what survives).
        import time as _time

        from ntt_aie_tpu.utils.streaming import stream_transform

        sub = 16
        total = max(B, 64)
        chunks = total // sub
        fns = plan.make_batched(sub)
        batches = [rng.integers(0, field.p, (sub, n)).astype(np.uint32)
                   for _ in range(chunks)]
        batches[0][0] = a
        # warm (compile) outside the timed region
        next(iter(stream_transform(fns["fwd"], batches[:1])))
        t0 = _time.perf_counter()
        outs = list(stream_transform(fns["fwd"], batches, prefetch=2))
        wall = _time.perf_counter() - t0
        us_per_ntt = wall * 1e6 / total
        from ntt_aie_tpu import native_oracle as native

        want = np.asarray(native.ntt_dif(
            a.astype(np.uint64), field.root_of_unity(n), field.p)
        )[tw.bit_reverse_indices(n)]
        ok = np.array_equal(
            outs[0][0][plan.spectral_to_natural].astype(np.uint64), want)
        gbf = (n // 2) * log_n / us_per_ntt / 1e3
        print(json.dumps({
            "metric": "streamed fwd NTT/s at n=2^24 (host<->device "
                      "overlap past the HBM wall)",
            "B_effective": total, "sub_batch": sub,
            "us_per_ntt_wall": round(us_per_ntt, 1),
            "ntts_per_sec": round(1e6 / us_per_ntt, 2),
            "g_butterflies_per_sec": round(gbf, 1),
            "gate": "PASS" if ok else "FAIL",
        }))
        return 0 if ok else 1

    n1, n2 = cfg.split
    layout = "flat"
    if B == 1:
        fwd, inv = plan.fwd, plan.inv
        xs = jnp.asarray(a)
    else:
        fns = plan.make_batched(B)
        fwd, inv = fns["fwd"], fns["inv"]
        batch = rng.integers(0, field.p, (B, n)).astype(np.uint32)
        batch[0] = a
        xs = jnp.asarray(batch)
        if fns.get("fwd_mat") is not None and n1 == n2:
            # matrix-form serving layout (DESIGN.md §3): the flat (B, n)
            # boundary retile measured 29% of device time at this size
            # (trace_v5e_logn24.json); n1 == n2 == 4096 so time_device
            # can chain output into input
            fwd, inv = fns["fwd_mat"], fns["inv_mat"]
            xs = xs.reshape(B, n1, n2)
            layout = "matrix-form"

    spec = fwd(xs)
    timed = inv if op == "inv" else fwd
    res = time_device(timed, spec if op == "inv" else xs,
                      iters=4, repeats=4)
    us_per_ntt = res["us_per_iter"] / B

    if op == "inv":
        # gate: device roundtrip is the identity (row 0)
        back = np.asarray(inv(spec)).reshape(B, n) if B > 1 else \
            np.asarray(inv(spec)).reshape(1, n)
        ok = np.array_equal(back[0], a)
    else:
        # bit-exact gate vs the native C++ oracle (row 0)
        out = np.asarray(spec)
        flat = out.reshape(B, n)[0] if B > 1 else out.reshape(n)
        from ntt_aie_tpu import native_oracle as native

        want = np.asarray(native.ntt_dif(
            a.astype(np.uint64), field.root_of_unity(n), field.p)
        )[tw.bit_reverse_indices(n)]
        ok = np.array_equal(
            flat[plan.spectral_to_natural].astype(np.uint64), want)
    gbf = (n // 2) * log_n / us_per_ntt / 1e3  # G butterflies/s
    print(json.dumps({
        "metric": f"{op} NTT/s at n=2^24 (single chip, factored twiddles)",
        "B": B, "layout": layout,
        "us_per_ntt": round(us_per_ntt, 1),
        "ntts_per_sec": round(1e6 / us_per_ntt, 2),
        "g_butterflies_per_sec": round(gbf, 1),
        "gate": "PASS" if ok else "FAIL",
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    main()
