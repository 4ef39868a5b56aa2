"""Measure fused_steady main-matmul precision vs speed on the real chip.

HIGHEST (6-pass bf16) is the shipping setting; this probe checks whether
HIGH (3-pass) stays within the <=1 int16 LSB dispatch gate on golden
content, and what it buys at bench scale.  Run on TPU only.

RESULT (2026-08-19, v5e): Mosaic's dot lowering rejects Precision.HIGH
outright (`NotImplementedError: Unsupported dot precision: HIGH`,
pallas/mosaic/lowering.py:_dot_general_lowering_rule) -- inside a Pallas
kernel the only choices are DEFAULT (1-pass bf16) and HIGHEST (6-pass).
A 3-pass middle ground would need a manual bf16 split-and-correct
(hi/lo decomposition) of the twiddle matmul; candidate for a later
round if the IMDCT matmul ever dominates the fused kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import ac3acm_tpu.ops.pallas_steady as PS
    from ac3acm_tpu.models.decoder import StreamFormat, premix_blocks
    from ac3acm_tpu.parallel.pipeline import (_fused_run, batched_pipeline,
                                              init_batched_carry)
    from bench import load_blocks

    blocks1, meta = load_blocks(8)
    fmt = StreamFormat(acmod=meta["acmod"], output=meta["output"],
                       slev_zero=meta["slev"] == 0.0,
                       chanbias=meta["chanbias"])
    sub = {k: v[:48] for k, v in blocks1.items()}
    pre = premix_blocks(fmt, sub)
    B = 4
    bat = jax.tree.map(
        lambda x: jnp.asarray(np.broadcast_to(x, (B,) + x.shape).copy()),
        pre)
    fn_x = batched_pipeline(fmt, emit_int16=True, steady=True,
                            long_only=True, premixed=True, pallas=False)
    cx, px = fn_x(init_batched_carry(B), bat)
    px = np.asarray(px, np.int64)
    t0 = time.time()
    for prec in ("HIGHEST", "HIGH"):
        PS.MATMUL_PRECISION = getattr(jax.lax.Precision, prec)
        f = jax.jit(_fused_run(fmt))
        cf, pf = f(init_batched_carry(B), bat)
        d = np.abs(np.asarray(pf, np.int64) - px)
        dc = np.abs(np.asarray(cf[0]) - np.asarray(cx[0]))
        print(f"{prec}: max {d.max()} LSB, frac>0 {(d > 0).mean():.2e}, "
              f"carry {dc.max():.2e}  [{time.time() - t0:.0f}s]",
              flush=True)

    # timing at bench scale: fused_steady alone, staged inputs
    from ac3acm_tpu.ops.pallas_steady import fused_steady
    Bb, n, Pn = 4096, 384, 2
    key = jax.random.PRNGKey(0)
    freq = jax.jit(lambda k: 0.01 * jax.random.normal(
        k, (Bb, n, Pn, 256), jnp.float32))(key)
    d0 = jnp.zeros((Bb, Pn, 128), jnp.float32)
    bias = jnp.full((Bb, n), 384.0, jnp.float32)
    chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    for prec in ("HIGHEST", "HIGH"):
        PS.MATMUL_PRECISION = getattr(jax.lax.Precision, prec)
        f = jax.jit(lambda q, d, b: fused_steady(q, d, b))
        out = f(freq, d0, bias)
        _ = int(chk(out[0]))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(freq, d0, bias)
            _ = int(chk(out[0]))
            best = min(best, time.perf_counter() - t0)
        xrt = Bb * n * 256 / 48000.0 / best
        print(f"{prec}: {best * 1000:.1f} ms at [{Bb},{n},{Pn}] "
              f"-> {xrt:.0f}x realtime", flush=True)


if __name__ == "__main__":
    main()
