"""Device-plan tests (XLA path on CPU backend): bit-exact vs NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from ntt_aie_tpu import fields as F
from ntt_aie_tpu import reference as ref
from ntt_aie_tpu import twiddles as tw
from ntt_aie_tpu.config import NTTConfig
from ntt_aie_tpu.api import NTTContext


@pytest.mark.parametrize("field,red", [(F.KYBER, "barrett"), (F.P_2013265921, "montgomery")])
@pytest.mark.parametrize("log_n", [4, 8])
def test_flat_forward_matches_oracle(field, red, log_n, rng):
    if field.max_n < (1 << log_n):
        pytest.skip("n too big for field")
    cfg = NTTConfig(field=field, log_n=log_n, reduction=red, rows_log2=log_n)
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    got = np.asarray(ctx.forward(jnp.asarray(a, dtype=jnp.uint32)))
    want = ref.ntt_dif(a, field)  # flat path spectral order == bitrev == DIF order
    assert np.array_equal(got.astype(np.int64), want)


@pytest.mark.parametrize("log_n,rows_log2", [(8, 3), (10, 5), (12, 5), (14, 7)])
def test_fourstep_forward_spectral_order(log_n, rows_log2, rng):
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=log_n, rows_log2=rows_log2)
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    flat = np.asarray(ctx.forward(jnp.asarray(a, dtype=jnp.uint32)))
    # X[k] = flat[pos[k]]
    pos = ctx.plan.spectral_to_natural
    want_natural = ref.ntt_forward(a, field)  # natural order ground truth
    assert np.array_equal(flat[pos].astype(np.int64), want_natural)


@pytest.mark.parametrize("field", [F.KYBER, F.DILITHIUM, F.P_998244353, F.P_2013265921])
def test_roundtrip_all_fields(field, rng):
    log_n = min(8, field.max_n.bit_length() - 1)
    cfg = NTTConfig(field=field, log_n=log_n)
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    back = np.asarray(ctx.inverse(ctx.forward(aj)))
    assert np.array_equal(back, a)


def test_natural_ordering_roundtrip(rng):
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=12, ordering="natural")
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    fwd = np.asarray(ctx.forward(aj))
    assert np.array_equal(fwd.astype(np.int64), ref.ntt_forward(a, field))
    assert np.array_equal(np.asarray(ctx.inverse(jnp.asarray(fwd))), a)


@pytest.mark.parametrize("field", [F.KYBER, F.P_2013265921])
def test_polymul_cyclic(field, rng):
    log_n = min(7, field.max_n.bit_length() - 1)
    n = 1 << log_n
    cfg = NTTConfig(field=field, log_n=log_n)
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, n)
    b = rng.integers(0, field.p, n)
    got = np.asarray(ctx.polymul(jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
    want = ref.schoolbook_cyclic(a, b, field.p)
    assert np.array_equal(got.astype(object), want)


def test_polymul_large_fourstep(rng):
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=12, rows_log2=5)  # force four-step
    ctx = NTTContext(cfg)
    n = cfg.n
    a = rng.integers(0, field.p, n)
    b = rng.integers(0, field.p, n)
    got = np.asarray(ctx.polymul(jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
    want = ref.cyclic_polymul(a, b, field)
    assert np.array_equal(got.astype(np.int64), want)


def test_negacyclic_polymul_device(rng):
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=10, rows_log2=5, negacyclic=True)  # four-step
    ctx = NTTContext(cfg)
    n = cfg.n
    a = rng.integers(0, field.p, n)
    b = rng.integers(0, field.p, n)
    got = np.asarray(
        ctx.plan.negacyclic_polymul(jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32))
    )
    want = ref.negacyclic_polymul(a, b, field)
    assert np.array_equal(got.astype(np.int64), want)


def test_reference_parity_device():
    """The flagship parity test: device plan == reference device output,
    logN=11, p=3329, a[i]=i (reference src/test.cpp:141, 203-219)."""
    cfg = NTTConfig(
        field=F.KYBER, log_n=11, table_convention="reference", ordering="reference"
    )
    ctx = NTTContext(cfg)
    a = np.arange(1 << 11)
    got = np.asarray(ctx.forward(jnp.asarray(a, dtype=jnp.uint32)))
    want = ref.reference_device_output(a, F.KYBER, 1 << 11)
    assert np.array_equal(got.astype(np.int64), want)


def test_reference_parity_partial_depth():
    """test_stage hook parity at every depth (src/test.cpp:55-57)."""
    from ntt_aie_tpu.ops import stages as S
    from ntt_aie_tpu.ops.reductions import make_reduction

    n = 1 << 8
    field = F.KYBER
    red = make_reduction("barrett", field)
    table_np = tw.power_table(field, n)
    table = tuple(jnp.asarray(t) for t in red.prepare_table(table_np))
    a = np.arange(n)
    for stage in range(8):
        got = np.asarray(
            S.reference_network_stages(
                jnp.asarray(a, dtype=jnp.uint32), table, field.p, red, stages=stage
            )
        )
        want = ref.reference_network(a, table_np, field.p, stages=stage)
        assert np.array_equal(got.astype(np.int64), want), f"stage {stage}"


def test_linearity_device(rng):
    field = F.P_998244353
    cfg = NTTConfig(field=field, log_n=11)
    ctx = NTTContext(cfg)
    p = field.p
    a = rng.integers(0, p, cfg.n)
    b = rng.integers(0, p, cfg.n)
    fa = np.asarray(ctx.forward(jnp.asarray(a, dtype=jnp.uint32))).astype(np.int64)
    fb = np.asarray(ctx.forward(jnp.asarray(b, dtype=jnp.uint32))).astype(np.int64)
    fab = np.asarray(ctx.forward(jnp.asarray((a + b) % p, dtype=jnp.uint32))).astype(np.int64)
    assert np.array_equal(fab, (fa + fb) % p)


# ---- Harvey lazy-butterfly reduction ----

def test_harvey_forward_and_roundtrip(rng):
    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=12, reduction="harvey")
    ctx = NTTContext(cfg)
    assert ctx.plan.reduction == "harvey"
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    flat = np.asarray(ctx.forward(aj))
    assert flat.max() < field.p, "canonicalization failed"
    pos = ctx.plan.spectral_to_natural
    assert np.array_equal(flat[pos].astype(np.int64), ref.ntt_forward(a, field))
    assert np.array_equal(np.asarray(ctx.inverse(jnp.asarray(flat))), a)


def test_harvey_auto_selected():
    assert NTTContext(NTTConfig(field=F.P_998244353, log_n=10)).plan.reduction == "harvey"
    assert NTTContext(NTTConfig(field=F.P_2013265921, log_n=10)).plan.reduction == "montgomery"


def test_harvey_polymul(rng):
    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=11, rows_log2=5)  # force four-step
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    b = rng.integers(0, field.p, cfg.n)
    got = np.asarray(ctx.polymul(jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
    want = ref.cyclic_polymul(a, b, field)
    assert np.array_equal(got.astype(np.int64), want)


def test_harvey4_forward_roundtrip_polymul(rng):
    """Approximate-Shoup [0,4p) lazy reduction: bit-exact vs the oracle
    on every path, and auto-selected for p < 2^29."""
    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=12, reduction="harvey4")
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    flat = np.asarray(ctx.forward(aj))
    assert flat.max() < field.p, "canonicalization failed"
    pos = ctx.plan.spectral_to_natural
    assert np.array_equal(flat[pos].astype(np.int64), ref.ntt_forward(a, field))
    assert np.array_equal(np.asarray(ctx.inverse(jnp.asarray(flat))), a)
    b = rng.integers(0, field.p, cfg.n)
    got = np.asarray(ctx.polymul(aj, jnp.asarray(b, dtype=jnp.uint32)))
    assert np.array_equal(got.astype(np.int64), ref.cyclic_polymul(a, b, field))
    # auto preference: 5-mul harvey4 below 2^29, 6-mul harvey below 2^30
    assert NTTContext(NTTConfig(field=field, log_n=10)).plan.reduction == "harvey4"


def test_harvey4_mulc_domain_and_values(rng):
    """mul_const: any x < 2^32 is legal input; output in [0, 4p) and
    congruent to x*w mod p (the approximation error is bounded by 2p)."""
    from ntt_aie_tpu.ops.reductions import make_reduction

    field = F.P_469762049
    p = field.p
    red = make_reduction("harvey4", field)
    w = rng.integers(0, p, 4096).astype(np.int64)
    tabs = [jnp.asarray(t) for t in red.prepare_table(w)]
    x = rng.integers(0, 1 << 32, 4096, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(red.mul_const(jnp.asarray(x), *tabs)).astype(np.uint64)
    assert got.max() < 4 * p
    assert np.array_equal(got % p, (x.astype(np.uint64) * w.astype(np.uint64)) % p)
    canon = np.asarray(red.canonicalize(jnp.asarray(got.astype(np.uint32))))
    assert canon.max() < p


# ---- Pallas engine (interpret mode on CPU) ----

def test_pallas_engine_matches_xla(rng):
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=11, rows_log2=4)  # (16, 128): 1 slab
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    plan_x = build_plan(cfg, engine="xla")
    plan_p = build_plan(cfg, engine="pallas", interpret=True)
    fx = np.asarray(plan_x.fwd(aj))
    fp = np.asarray(plan_p.fwd(aj))
    assert np.array_equal(fx, fp)
    back = np.asarray(plan_p.inv(jnp.asarray(fp)))
    assert np.array_equal(back, a)


def test_polymul_with_natural_ordering(rng):
    """Regression: the ordering wrapper must not leak into polymul's
    internal transforms (pointwise products run in spectral order)."""
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=10, rows_log2=4, ordering="natural")
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    b = rng.integers(0, field.p, cfg.n)
    got = np.asarray(ctx.polymul(jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
    want = ref.cyclic_polymul(a, b, field)
    assert np.array_equal(got.astype(np.int64), want)


def test_pallas_batched_batch_one(rng):
    """Regression: make_batched(1) builds unbatched 2-D kernels; the (1, n)
    input must reshape to (n1, n2), not (1, n1, n2)."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=11, rows_log2=4)
    plan_p = build_plan(cfg, engine="pallas", interpret=True)
    a = rng.integers(0, field.p, cfg.n)
    batched = plan_p.make_batched(1)
    got = np.asarray(batched["fwd"](jnp.asarray(a[None], dtype=jnp.uint32)))
    assert got.shape == (1, cfg.n)
    assert np.array_equal(got[0], np.asarray(plan_p.fwd(jnp.asarray(a, dtype=jnp.uint32))))


def test_host_oracle_matches_device_default_ordering(rng):
    """Regression (review finding): forward_host/inverse_host must agree
    with the device plan's spectral order for the default 'bitrev'
    ordering with an (n1, n2) split — not plain DIF bit reversal."""
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=10, rows_log2=3)  # split (8, 128)
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, cfg.n)
    dev = np.asarray(ctx.forward(jnp.asarray(a, dtype=jnp.uint32)))
    host = ctx.forward_host(a)
    assert np.array_equal(dev.astype(np.int64), host.astype(np.int64))
    assert np.array_equal(ctx.inverse_host(host), a)


def test_pallas_batched_honors_natural_ordering(rng):
    """Regression (review finding): make_batched must apply the natural-
    ordering wrapper on the pallas engine, like the unbatched callables."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=11, rows_log2=4, ordering="natural")
    plan = build_plan(cfg, engine="pallas", interpret=True)
    a = rng.integers(0, field.p, cfg.n)
    batched = plan.make_batched(2)
    got = np.asarray(batched["fwd"](jnp.asarray(np.stack([a, a]), dtype=jnp.uint32)))
    want = np.asarray(plan.fwd(jnp.asarray(a, dtype=jnp.uint32)))
    assert np.array_equal(got[0], want)
    back = np.asarray(batched["inv"](jnp.asarray(got)))
    assert np.array_equal(back[1], a)


def test_non_primitive_generator_rejected():
    """Regression (review finding): Fermat-only validation accepted
    non-primitive generators."""
    import pytest

    with pytest.raises(ValueError, match="primitive"):
        F.PrimeField(p=17, g=4)
    F.PrimeField(p=17, g=3)  # actual primitive root: fine


def test_negacyclic_fused_pallas(rng):
    """The fully fused RLWE pipeline (psi scalings riding the colpass
    wmat slots) matches the oracle, both reductions."""
    from ntt_aie_tpu.plan import build_plan

    for field in (F.P_469762049, F.P_2013265921):
        cfg = NTTConfig(field=field, log_n=10, rows_log2=3, negacyclic=True)
        plan = build_plan(cfg, engine="pallas", interpret=True)
        a = rng.integers(0, field.p, cfg.n)
        b = rng.integers(0, field.p, cfg.n)
        got = np.asarray(plan.negacyclic_polymul(
            jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
        want = ref.negacyclic_polymul(a, b, field)
        assert np.array_equal(got.astype(np.int64), want), field.name


def test_negacyclic_batched_pallas(rng):
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=9, rows_log2=3, negacyclic=True)
    plan = build_plan(cfg, engine="pallas", interpret=True)
    B = 2
    a = rng.integers(0, field.p, (B, cfg.n))
    b = rng.integers(0, field.p, (B, cfg.n))
    nega_b = plan.make_batched(B)["negacyclic_polymul"]
    got = np.asarray(nega_b(jnp.asarray(a, dtype=jnp.uint32),
                            jnp.asarray(b, dtype=jnp.uint32)))
    for i in range(B):
        want = ref.negacyclic_polymul(a[i], b[i], field)
        assert np.array_equal(got[i].astype(np.int64), want)


def test_pallas_batched_polymul_natural_ordering(rng):
    """Regression (2nd review): batched polymul must use the raw spectral
    forward even when the ordering wrapper rebinds fwd_b."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=11, rows_log2=4, ordering="natural")
    plan = build_plan(cfg, engine="pallas", interpret=True)
    a = rng.integers(0, field.p, (2, cfg.n))
    b = rng.integers(0, field.p, (2, cfg.n))
    got = np.asarray(plan.make_batched(2)["polymul"](
        jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(b, dtype=jnp.uint32)))
    want = ref.cyclic_polymul(a[0], b[0], field)
    assert np.array_equal(got[0].astype(np.int64), want)


def test_xla_batched_includes_negacyclic(rng):
    from ntt_aie_tpu.plan import build_plan

    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=8, negacyclic=True)
    plan = build_plan(cfg, engine="xla")
    a = rng.integers(0, field.p, (2, cfg.n))
    got = np.asarray(plan.make_batched(2)["negacyclic_polymul"](
        jnp.asarray(a, dtype=jnp.uint32), jnp.asarray(a, dtype=jnp.uint32)))
    want = ref.negacyclic_polymul(a[1], a[1], field)
    assert np.array_equal(got[1].astype(np.int64), want)


def test_inverse_host_reference_convention_raises():
    import pytest

    cfg = NTTConfig(field=F.KYBER, log_n=11, table_convention="reference")
    ctx = NTTContext(cfg)
    with pytest.raises(NotImplementedError):
        ctx.inverse_host(np.zeros(cfg.n, dtype=np.int64))


def test_fused_fourstep_single_kernel(rng):
    """Single-kernel whole-transform (both passes + in-register transpose)
    matches the two-kernel path, forward and inverse, incl. negacyclic
    pre/post fusion (opt-in via build_plan(fused=True); tested here
    directly at a small size in interpret mode)."""
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=10, rows_log2=5, negacyclic=True)
    n1, n2 = cfg.split
    plan = build_plan(cfg, engine="xla")
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)

    tabs = tw.fourstep_tables(field, n1, n2)
    ff = PN.make_fused_fourstep(field, n1, n2, reduction="harvey",
                                wmid=np.ascontiguousarray(tabs["wmat"].T),
                                interpret=True)
    got = np.asarray(ff(aj.reshape(n1, n2))).reshape(-1)
    assert np.array_equal(got, np.asarray(plan.fwd(aj)))

    fi = PN.make_fused_fourstep(field, n1, n2, reduction="harvey",
                                wmid=tabs["iwmat_scaled"], inverse=True,
                                interpret=True)
    back = np.asarray(fi(jnp.asarray(got, dtype=jnp.uint32).reshape(n2, n1))).reshape(-1)
    assert np.array_equal(back, a)

    # negacyclic: psi pre / psi^-1 post riding the fused kernels
    psi = tw.negacyclic_psi_powers(field, cfg.n).reshape(n1, n2)
    psi_inv = tw.negacyclic_psi_powers(field, cfg.n, inverse=True).reshape(n1, n2)
    nf = PN.make_fused_fourstep(field, n1, n2, reduction="harvey",
                                wmid=np.ascontiguousarray(tabs["wmat"].T),
                                pre=psi, interpret=True)
    ni = PN.make_fused_fourstep(field, n1, n2, reduction="harvey",
                                wmid=tabs["iwmat_scaled"], inverse=True,
                                post=psi_inv, interpret=True)
    from ntt_aie_tpu.ops.reductions import make_reduction
    red = make_reduction("harvey", field)
    b = rng.integers(0, field.p, cfg.n)
    fa = nf(aj.reshape(n1, n2)).reshape(-1)
    fb = nf(jnp.asarray(b, dtype=jnp.uint32).reshape(n1, n2)).reshape(-1)
    fc = red.mul_data(fa, fb)
    got_n = np.asarray(ni(fc.reshape(n2, n1))).reshape(-1)
    want_n = ref.negacyclic_polymul(a, b, field)
    assert np.array_equal(got_n.astype(np.int64), want_n)


def test_build_plan_fused_true_wiring(rng):
    """The fused=True plan wiring (fwd/inv/polymul/negacyclic + batched)
    matches the default plan, interpret mode."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=10, rows_log2=5, negacyclic=True)
    base = build_plan(cfg, engine="xla")
    fz = build_plan(cfg, engine="pallas", interpret=True, fused=True)
    a = rng.integers(0, field.p, cfg.n)
    b = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    bj = jnp.asarray(b, dtype=jnp.uint32)
    assert np.array_equal(np.asarray(fz.fwd(aj)), np.asarray(base.fwd(aj)))
    assert np.array_equal(np.asarray(fz.inv(base.fwd(aj))), a)
    assert np.array_equal(np.asarray(fz.polymul(aj, bj)),
                          np.asarray(base.polymul(aj, bj)))
    assert np.array_equal(np.asarray(fz.negacyclic_polymul(aj, bj)),
                          np.asarray(base.negacyclic_polymul(aj, bj)))
    bat = fz.make_batched(2)
    ab = jnp.asarray(np.stack([a, a]), dtype=jnp.uint32)
    bb = jnp.asarray(np.stack([b, b]), dtype=jnp.uint32)
    assert np.array_equal(np.asarray(bat["fwd"](ab))[0], np.asarray(base.fwd(aj)))
    assert np.array_equal(np.asarray(bat["negacyclic_polymul"](ab, bb))[0],
                          np.asarray(base.negacyclic_polymul(aj, bj)))


def test_flat_batched_lane_layout(rng):
    """Small-n batched path (batch-to-lanes): matches per-vector results,
    all ops, including the ML-DSA ring (dilithium negacyclic at n=256)."""
    field = F.DILITHIUM
    cfg = NTTConfig(field=field, log_n=8, rows_log2=8, negacyclic=True)
    ctx = NTTContext(cfg)
    B = 3
    a = rng.integers(0, field.p, (B, cfg.n))
    b = rng.integers(0, field.p, (B, cfg.n))
    aj = jnp.asarray(a, dtype=jnp.uint32)
    bj = jnp.asarray(b, dtype=jnp.uint32)
    bat = ctx.plan.make_batched(B)
    got_f = np.asarray(bat["fwd"](aj))
    for i in range(B):
        assert np.array_equal(got_f[i], np.asarray(ctx.forward(aj[i])))
    assert np.array_equal(np.asarray(bat["inv"](jnp.asarray(got_f))), a)
    got_p = np.asarray(bat["polymul"](aj, bj))
    assert np.array_equal(got_p[0].astype(np.int64),
                          ref.cyclic_polymul(a[0], b[0], field))
    got_n = np.asarray(bat["negacyclic_polymul"](aj, bj))
    want_n = ref.negacyclic_polymul(a[1], b[1], field)  # the ML-DSA ring
    assert np.array_equal(got_n[1].astype(np.int64), want_n)


def test_flat_batched_honors_natural_ordering(rng):
    """Regression (4th review): the flat batch-to-lanes path must honor
    ordering='natural' like every other make_batched variant."""
    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=9, rows_log2=9, ordering="natural")
    ctx = NTTContext(cfg)
    a = rng.integers(0, field.p, (2, cfg.n))
    aj = jnp.asarray(a, dtype=jnp.uint32)
    bat = ctx.plan.make_batched(2)
    got = np.asarray(bat["fwd"](aj))
    assert np.array_equal(got[0].astype(np.int64), ref.ntt_forward(a[0], field))
    assert np.array_equal(np.asarray(bat["inv"](jnp.asarray(got))), a)


def test_default_split_flat_small_n():
    """Small single-shard configs auto-select the flat (batch-to-lanes)
    split; sharded and large configs keep the four-step split."""
    assert NTTConfig(field=F.P_469762049, log_n=10).split == (1 << 10, 1)
    assert NTTConfig(field=F.P_469762049, log_n=16).split == (1 << 16, 1)
    assert NTTConfig(field=F.P_469762049, log_n=18).split[1] > 1
    assert NTTConfig(field=F.P_469762049, log_n=12, num_shards=4).split[1] > 1


def test_default_split_flat_cutoff_field_aware():
    assert NTTConfig(field=F.GOLDILOCKS, log_n=14).split == (1 << 14, 1)
    assert NTTConfig(field=F.GOLDILOCKS, log_n=16).split[1] > 1


@pytest.mark.parametrize("direction", ["dif", "dit"])
@pytest.mark.parametrize("reduction", ["harvey", "harvey4"])
@pytest.mark.parametrize("fuse", [2, 3, 4])
def test_colpass_fuse_levels_match(direction, reduction, fuse, rng):
    """The radix-2^K fused stage groups (ops/pallas_ntt.run_stages) must
    match the sequential radix-2 network (fuse=1) for BOTH recursion
    directions. DIF raw lazy-domain bits are identical (same per-element
    op sequence regardless of K). DIT subtree outputs that feed the next
    level's multiply legally skip their conditional corrections inside a
    group (add_for_mul/sub_for_mul), so fused raw bits differ from fuse=1
    by multiples of p — canonical values must still be bit-equal. Guards
    the whole-half vectorized net_dit restructure + the lazy skip."""
    from ntt_aie_tpu.ops import pallas_ntt as PN
    from ntt_aie_tpu.ops.reductions import make_reduction

    field = F.P_469762049
    n1, n2 = 64, 8
    x = rng.integers(0, field.p, (n1, n2)).astype(np.uint32)
    base = PN.make_colpass(field, n1, n2, reduction=reduction,
                           direction=direction, interpret=True, fuse=1)
    fused = PN.make_colpass(field, n1, n2, reduction=reduction,
                            direction=direction, interpret=True, fuse=fuse)
    got_b, got_f = np.asarray(base(x)), np.asarray(fused(x))
    if direction == "dif":
        assert np.array_equal(got_b, got_f)
    else:
        red = make_reduction(reduction, field)
        canon = lambda a: np.asarray(red.canonicalize(jnp.asarray(a)))
        assert np.array_equal(canon(got_b), canon(got_f))
        # group top levels are never lazy: raw colpass output stays in
        # the travel domain
        dom = 4 * field.p if reduction == "harvey4" else 2 * field.p
        assert int(got_f.max()) < dom


def test_fourstep_wfac_product_matches_wmat():
    """fourstep_wfac_T factor product must equal the full wmat (and the
    scaled inverse matrix) entrywise mod p — the factored kernel path is
    only correct if the factorization is (twiddles.fourstep_wfac_T)."""
    field = F.P_469762049
    n1, n2 = 32, 128
    tabs = tw.fourstep_tables(field, n1, n2)
    for inverse, full in ((False, tabs["wmat"].T),
                          (True, tabs["iwmat_scaled"].T)):
        t1, t2 = tw.fourstep_wfac_T(
            field, n1, n2, inverse=inverse,
            scale=tabs["n_inv"] if inverse else None)
        S = n2 // t1.shape[0]
        assert t2.shape[0] == S and t1.shape[1] == t2.shape[1] == n1
        got = (t1[:, None, :].astype(object) * t2[None, :, :]
               % field.p).reshape(n2, n1)
        assert np.array_equal(got.astype(np.int64), np.asarray(full))


@pytest.mark.parametrize("redkind,field", [
    ("harvey4", F.P_469762049),
    ("harvey", F.P_998244353),
    ("montgomery", F.P_2013265921),
])
def test_plan_wmat_factored_matches_full(redkind, field, rng):
    """wmat_factored plans must produce bit-identical canonical outputs to
    the full-matrix plans for fwd/inv/polymul/negacyclic, unbatched and
    batched (the factored multiply is two chained constant multiplies
    against sqrt-size tables; values agree mod p by construction)."""
    from ntt_aie_tpu.plan import build_plan

    cfg = NTTConfig(field=field, log_n=10, rows_log2=5, reduction=redkind,
                    negacyclic=True)
    pf = build_plan(cfg, engine="pallas", interpret=True, wmat_factored=True)
    pl = build_plan(cfg, engine="pallas", interpret=True, wmat_factored=False)
    # the plan records whether factored kernels were ACTUALLY built (the
    # request downgrades silently on non-pallas engines; A/B scripts and
    # the bench CLI report this field)
    assert pf.wmat_factored and not pl.wmat_factored
    assert not build_plan(cfg, engine="xla", wmat_factored=True).wmat_factored
    a = rng.integers(0, field.p, cfg.n).astype(np.uint32)
    b = rng.integers(0, field.p, cfg.n).astype(np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    assert np.array_equal(np.asarray(pf.fwd(aj)), np.asarray(pl.fwd(aj)))
    assert np.array_equal(np.asarray(pf.inv(pf.fwd(aj))), a)
    assert np.array_equal(np.asarray(pf.polymul(aj, bj)),
                          np.asarray(pl.polymul(aj, bj)))
    assert np.array_equal(np.asarray(pf.negacyclic_polymul(aj, bj)),
                          np.asarray(pl.negacyclic_polymul(aj, bj)))
    B = 2
    bf, blt = pf.make_batched(B), pl.make_batched(B)
    ab = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
    bb = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
    abj, bbj = jnp.asarray(ab), jnp.asarray(bb)
    assert np.array_equal(np.asarray(bf["fwd"](abj)),
                          np.asarray(blt["fwd"](abj)))
    assert np.array_equal(np.asarray(bf["inv"](bf["fwd"](abj))), ab)
    assert np.array_equal(np.asarray(bf["negacyclic_polymul"](abj, bbj)),
                          np.asarray(blt["negacyclic_polymul"](abj, bbj)))


def test_negacyclic_psi_factors_match_matrix():
    """negacyclic_psi_factors is an exact rank-1 factorization of the psi
    power matrix: row[r] * col[c] == psi^(r*n2 + c) entrywise, forward and
    inverse (the factored negacyclic passes depend on it)."""
    field = F.P_469762049
    n1, n2 = 16, 64
    for inverse in (False, True):
        full = tw.negacyclic_psi_powers(field, n1 * n2,
                                        inverse=inverse).reshape(n1, n2)
        r, c = tw.negacyclic_psi_factors(field, n1, n2, inverse=inverse)
        got = r[:, None].astype(object) * c[None, :] % field.p
        assert np.array_equal(got.astype(np.int64), np.asarray(full))


def test_context_single_chip_plan_kwargs(rng):
    """NTTContext without mesh= forwards build_plan's own knobs (engine,
    interpret, fused, wmat_factored) — one entry point, all knobs, like the
    reference's single CLI surface (src/test.cpp:85-92). Distributed-only
    kwargs still raise without mesh=."""
    field = F.P_2013265921
    cfg = NTTConfig(field=field, log_n=10, rows_log2=5)
    a = rng.integers(0, field.p, cfg.n)
    aj = jnp.asarray(a, dtype=jnp.uint32)
    want = np.asarray(NTTContext(cfg).forward(aj))

    got = np.asarray(NTTContext(cfg, engine="xla").forward(aj))
    assert np.array_equal(got, want)
    # pallas engine in interpret mode works on the CPU backend
    got = np.asarray(
        NTTContext(cfg, engine="pallas", interpret=True).forward(aj))
    assert np.array_equal(got, want)

    with pytest.raises(TypeError, match="need mesh="):
        NTTContext(cfg, overlap_chunks=2)
    with pytest.raises(TypeError, match="need mesh="):
        NTTContext(cfg, dp_axis="dp")


def test_dit_nets_match_across_fuse(rng):
    """The three DIT group networks (parts default / tree / iter) and
    several fuse levels produce identical CANONICAL outputs (raw
    lazy-domain bits may differ legally) for every lazy reduction.
    Guards the round-3 net swap (DESIGN.md §3 DIT ladder)."""
    from ntt_aie_tpu.ops import pallas_ntt as PN

    n1 = n2 = 64
    for field, red in ((F.P_469762049, "harvey4"), (F.P_998244353, "harvey"),
                       (F.P_2013265921, "montgomery")):
        x = jnp.asarray(rng.integers(0, field.p, (n1, n2)).astype(np.uint32))
        outs = []
        for net, fuse in (("parts", None), ("parts", 3), ("parts", 6),
                          ("tree", 3), ("iter", 3), ("tree", 1)):
            cp = PN.make_colpass(field, n1, n2, reduction=red,
                                 direction="dit", inverse_tw=True,
                                 canonicalize=True, interpret=True,
                                 dit_net=net, fuse=fuse)
            outs.append(np.asarray(cp(x)))
        for o in outs[1:]:
            assert np.array_equal(o, outs[0]), (red,)


def test_matrix_form_callables(rng):
    """Matrix-form batched callables (fwd_mat/inv_mat/polymul_mat) are
    bit-identical to the flat contract under row-major (un)flattening —
    they exist to skip the flat<->2D boundary retile (a physical lane-axis
    retile on TPU, ~30% of the chained flat pipeline; DESIGN.md §3)."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    for fused, B in ((False, 3), (False, 1), (True, 2)):
        cfg = NTTConfig(field=field, log_n=10, rows_log2=5)
        plan = build_plan(cfg, engine="pallas", interpret=True, fused=fused)
        n1, n2 = cfg.split
        bat = plan.make_batched(B)
        a = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
        b = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
        am = jnp.asarray(a.reshape(B, n1, n2))

        fm = np.asarray(bat["fwd_mat"](am))
        assert fm.shape == (B, n2, n1), (fused, B)
        flat = np.asarray(bat["fwd"](jnp.asarray(a)))
        assert np.array_equal(fm.reshape(B, cfg.n), flat), (fused, B)

        im = np.asarray(bat["inv_mat"](jnp.asarray(fm)))
        assert im.shape == (B, n1, n2)
        assert np.array_equal(im.reshape(B, cfg.n), a), (fused, B)

        pm = np.asarray(bat["polymul_mat"](am, jnp.asarray(
            b.reshape(B, n1, n2))))
        assert pm.shape == (B, n1, n2)
        pflat = np.asarray(bat["polymul"](jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(pm.reshape(B, cfg.n), pflat), (fused, B)


def test_matrix_form_negacyclic_and_natural_gating(rng):
    """negacyclic_polymul_mat matches the flat negacyclic product; natural-
    ordering plans expose the layout-safe polymul_mat but NOT fwd_mat (a
    flat permutation has no cheap matrix-form equivalent)."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=9, rows_log2=4, negacyclic=True)
    plan = build_plan(cfg, engine="pallas", interpret=True)
    n1, n2 = cfg.split
    B = 2
    bat = plan.make_batched(B)
    a = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
    b = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
    gm = np.asarray(bat["negacyclic_polymul_mat"](
        jnp.asarray(a.reshape(B, n1, n2)), jnp.asarray(b.reshape(B, n1, n2))))
    gf = np.asarray(bat["negacyclic_polymul"](jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(gm.reshape(B, cfg.n), gf)

    cfgn = NTTConfig(field=field, log_n=9, rows_log2=4, ordering="natural")
    batn = build_plan(cfgn, engine="pallas", interpret=True).make_batched(B)
    assert "fwd_mat" not in batn and "inv_mat" not in batn
    got = np.asarray(batn["polymul_mat"](
        jnp.asarray(a.reshape(B, n1, n2)), jnp.asarray(b.reshape(B, n1, n2))))
    want = ref.cyclic_polymul(a[0], b[0], field)
    assert np.array_equal(got[0].reshape(cfgn.n).astype(np.int64), want)


def test_unbatched_matrix_form_twins(rng):
    """Plan.fwd_mat/inv_mat/polymul_mat/negacyclic_polymul_mat (round 5):
    the B=1 latency twins of the batched *_mat callables — same kernels,
    no flat boundary retile, bit-identical to the flat callables under
    row-major (un)flattening. Natural-ordering plans keep the layout-safe
    polymul twins but drop fwd_mat/inv_mat."""
    from ntt_aie_tpu.plan import build_plan

    field = F.P_469762049
    for fused in (False, True):
        cfg = NTTConfig(field=field, log_n=10, rows_log2=5, negacyclic=True)
        plan = build_plan(cfg, engine="pallas", interpret=True, fused=fused)
        n1, n2 = cfg.split
        a = rng.integers(0, field.p, cfg.n).astype(np.uint32)
        b = rng.integers(0, field.p, cfg.n).astype(np.uint32)
        am = jnp.asarray(a.reshape(n1, n2))
        bm = jnp.asarray(b.reshape(n1, n2))

        fm = np.asarray(plan.fwd_mat(am))
        assert fm.shape == (n2, n1), fused
        flat = np.asarray(plan.fwd(jnp.asarray(a)))
        assert np.array_equal(fm.reshape(cfg.n), flat), fused

        im = np.asarray(plan.inv_mat(jnp.asarray(fm)))
        assert im.shape == (n1, n2)
        assert np.array_equal(im.reshape(cfg.n), a), fused

        pm = np.asarray(plan.polymul_mat(am, bm))
        pflat = np.asarray(plan.polymul(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(pm.reshape(cfg.n), pflat), fused

        gm = np.asarray(plan.negacyclic_polymul_mat(am, bm))
        gflat = np.asarray(plan.negacyclic_polymul(jnp.asarray(a),
                                                   jnp.asarray(b)))
        assert np.array_equal(gm.reshape(cfg.n), gflat), fused

    # natural ordering: polymul twins stay, fwd/inv twins are gated off
    cfgn = NTTConfig(field=field, log_n=10, rows_log2=5, ordering="natural")
    plann = build_plan(cfgn, engine="pallas", interpret=True)
    assert plann.fwd_mat is None and plann.inv_mat is None
    n1, n2 = cfgn.split
    a = rng.integers(0, field.p, cfgn.n).astype(np.uint32)
    b = rng.integers(0, field.p, cfgn.n).astype(np.uint32)
    got = np.asarray(plann.polymul_mat(jnp.asarray(a.reshape(n1, n2)),
                                       jnp.asarray(b.reshape(n1, n2))))
    want = ref.cyclic_polymul(a, b, field)
    assert np.array_equal(got.reshape(cfgn.n).astype(np.int64), want)

    # flat-split and xla plans have no matrix-form kernels
    flatp = build_plan(NTTConfig(field=field, log_n=8, rows_log2=8))
    assert flatp.fwd_mat is None and flatp.polymul_mat is None


def test_context_serving_surface(rng):
    """NTTContext.make_batched / forward_mat / polymul_mat (round 5): the
    documented L3 driver exposes the serving layout — delegation to the
    plan's batched dict and the unbatched twins, with clear errors where
    they don't exist (mesh contexts, xla plans)."""
    field = F.P_469762049
    cfg = NTTConfig(field=field, log_n=10, rows_log2=5)
    ctx = NTTContext(cfg, engine="pallas", interpret=True)
    n1, n2 = cfg.split
    B = 2
    bat = ctx.make_batched(B)
    assert set(bat) >= {"fwd", "inv", "polymul", "fwd_mat", "inv_mat",
                        "polymul_mat"}
    a = rng.integers(0, field.p, (B, cfg.n)).astype(np.uint32)
    fm = np.asarray(bat["fwd_mat"](jnp.asarray(a.reshape(B, n1, n2))))
    assert np.array_equal(fm.reshape(B, cfg.n),
                          np.asarray(bat["fwd"](jnp.asarray(a))))

    am = jnp.asarray(a[0].reshape(n1, n2))
    fm1 = np.asarray(ctx.forward_mat(am))
    assert np.array_equal(fm1.reshape(cfg.n), np.asarray(ctx.forward(a[0])))
    assert np.array_equal(np.asarray(ctx.inverse_mat(jnp.asarray(fm1))),
                          np.asarray(am))
    pm = np.asarray(ctx.polymul_mat(am, am))
    assert np.array_equal(pm.reshape(cfg.n),
                          np.asarray(ctx.polymul(a[0], a[0])))

    # xla plans have no matrix-form kernels -> informative error
    ctx_xla = NTTContext(cfg, engine="xla")
    with pytest.raises(NotImplementedError, match="matrix-form"):
        ctx_xla.forward_mat(am)

    # negacyclic twin needs negacyclic=True planning (via plan attr)
    with pytest.raises(NotImplementedError, match="matrix-form"):
        ctx_xla.negacyclic_polymul_mat(am, am)


def test_context_make_batched_rejects_mesh():
    import jax
    from ntt_aie_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2)
    cfg = NTTConfig(field=F.P_469762049, log_n=10, rows_log2=5, num_shards=2)
    ctx = NTTContext(cfg, mesh=mesh)
    with pytest.raises(NotImplementedError, match="dp_axis"):
        ctx.make_batched(4)


def test_plan_wmat_fold_matches_default(rng):
    """wmat_fold plans (round 5: the four-step multiply rides the
    transposing pass's exit 'post_t' instead of the next pass's entry)
    must be bit-identical to the default entry placement for
    fwd/inv/polymul/negacyclic — unbatched, batched, and matrix-form.
    The multiply commutes with the inter-pass store/load."""
    from ntt_aie_tpu.plan import build_plan

    for redkind, field in (("harvey4", F.P_469762049),
                           ("montgomery", F.P_2013265921)):
        cfg = NTTConfig(field=field, log_n=10, rows_log2=5, negacyclic=True,
                        reduction=redkind)
        # fold is the DEFAULT since the round-5 A/B (never worse, inv
        # -4.4%); wmat_fold=False is the entry-placement A/B arm
        base = build_plan(cfg, engine="pallas", interpret=True,
                          wmat_fold=False)
        fold = build_plan(cfg, engine="pallas", interpret=True)
        assert fold.wmat_fold and not base.wmat_fold
        a = rng.integers(0, field.p, cfg.n).astype(np.uint32)
        b = rng.integers(0, field.p, cfg.n).astype(np.uint32)
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        want_f = np.asarray(base.fwd(aj))
        assert np.array_equal(np.asarray(fold.fwd(aj)), want_f), redkind
        assert np.array_equal(np.asarray(fold.inv(jnp.asarray(want_f))),
                              np.asarray(base.inv(jnp.asarray(want_f))))
        assert np.array_equal(np.asarray(fold.polymul(aj, bj)),
                              np.asarray(base.polymul(aj, bj))), redkind
        assert np.array_equal(np.asarray(fold.negacyclic_polymul(aj, bj)),
                              np.asarray(base.negacyclic_polymul(aj, bj)))

        B = 2
        n1, n2 = cfg.split
        ab = np.stack([a, b])
        bb = np.stack([b, a])
        bf, bb_ = fold.make_batched(B), base.make_batched(B)
        assert np.array_equal(np.asarray(bf["fwd"](jnp.asarray(ab))),
                              np.asarray(bb_["fwd"](jnp.asarray(ab))))
        assert np.array_equal(
            np.asarray(bf["negacyclic_polymul"](jnp.asarray(ab),
                                                jnp.asarray(bb))),
            np.asarray(bb_["negacyclic_polymul"](jnp.asarray(ab),
                                                 jnp.asarray(bb))))
        am = jnp.asarray(ab.reshape(B, n1, n2))
        assert np.array_equal(np.asarray(bf["fwd_mat"](am)),
                              np.asarray(bb_["fwd_mat"](am)))
        # unbatched matrix twins share the folded kernels
        assert np.array_equal(
            np.asarray(fold.polymul_mat(jnp.asarray(a.reshape(n1, n2)),
                                        jnp.asarray(b.reshape(n1, n2)))),
            np.asarray(base.polymul_mat(jnp.asarray(a.reshape(n1, n2)),
                                        jnp.asarray(b.reshape(n1, n2)))))

    # fold silently downgrades off-path (xla / factored / fused)
    assert not build_plan(cfg, engine="xla", wmat_fold=True).wmat_fold
    assert not build_plan(cfg, engine="pallas", interpret=True,
                          wmat_factored=True, wmat_fold=True).wmat_fold


def test_colpass_post_t_requires_transpose():
    from ntt_aie_tpu.ops.pallas_ntt import make_colpass

    field = F.P_469762049
    wm = np.ones((16, 32), dtype=np.int64)
    with pytest.raises(ValueError, match="post_t"):
        make_colpass(field, 32, 16, reduction="harvey4", direction="dif",
                     wmat=wm, twiddle_pos="post_t", interpret=True)
