"""Kernel-level timing of the fused steady decode path on the live TPU.

Separates: (a) the raw Pallas kernel on HBM-staged input, (b) the
production _fused_run dispatch (entry fixups + carry update), (c) the XLA
steady body, at bench shapes.  Checksum fetch per call (axon tunnel).

Usage: python tools/profile_decode.py [batch] [frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.decoder import StreamFormat
from ac3acm_tpu.ops.pallas_steady import fused_steady
from ac3acm_tpu.parallel.pipeline import (batched_pipeline,
                                          init_batched_carry)


def timeit(name, fn, *args, reps=5):
    chk = jax.jit(lambda t: sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                for x in jax.tree.leaves(t)))
    out = fn(*args)
    _ = float(chk(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(chk(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best * 1000:8.2f} ms")
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n = F * 6
    P = 2
    rng = np.random.default_rng(0)
    freq = jax.jit(lambda x: jnp.broadcast_to(
        x, (B, n, P, 256)).copy())(jnp.asarray(
            (rng.standard_normal((1, n, P, 256)) * 0.01).astype(np.float32)))
    d0 = jnp.zeros((B, P, 128), jnp.float32)
    bias = jnp.full((B, n), 384.0, jnp.float32)
    blksw = np.zeros((B, n, 5), bool)
    jax.block_until_ready((freq, d0, bias))
    xrt = lambda dt: B * n * 256 / 48000.0 / dt

    t = timeit("raw fused_steady kernel", jax.jit(fused_steady),
               freq, d0, bias)
    print(f"{'':40s} {xrt(t):10.0f}x")

    fmt = StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO,
                       slev_zero=False, chanbias=31)
    blocks = {"freq": freq, "blksw": blksw, "bias": bias}
    carry = init_batched_carry(B)
    for name, pallas in (("production fused dispatch", True),
                         ("XLA steady body", False)):
        fn = batched_pipeline(fmt, emit_int16=True, steady=True,
                              long_only=True, premixed=True, pallas=pallas)
        t = timeit(name, fn, carry, blocks)
        print(f"{'':40s} {xrt(t):10.0f}x")


if __name__ == "__main__":
    main()
