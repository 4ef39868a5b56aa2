"""A/B the fused steady kernel: 6-pass HIGHEST vs 3-pass hi/lo split.

Synthetic premixed planes at a bench-like shape, K-chained dispatches
(delay carry feeds back) with a scalar checksum barrier.

Usage: python tools/micro_fused.py [B] [n] [P]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

from ac3acm_tpu.ops import pallas_steady as PS

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n = int(sys.argv[2]) if len(sys.argv) > 2 else 48
Pn = int(sys.argv[3]) if len(sys.argv) > 3 else 2
K = 4

rng = np.random.default_rng(0)
freq = jnp.asarray((rng.standard_normal((B, n, Pn, 256)) * 0.01)
                   .astype(np.float32))
d0 = jnp.zeros((B, Pn, 128), jnp.float32)
bias = jnp.full((B, n), 384.0, jnp.float32)
chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

def case(hilo, bb):
    PS.HILO = hilo

    @jax.jit
    def run(freq, d0, bias):
        pcm = None
        d = d0
        for _ in range(K):
            pcm, d = PS.fused_steady(freq, d, bias, bb=bb)
        return pcm, d

    try:
        pcm, d = run(freq, d0, bias)
        _ = int(chk(pcm))
    except Exception as e:
        print(f"hilo={hilo} bb={bb}  FAILED: {type(e).__name__}",
              flush=True)
        return
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        pcm, _d = run(freq, d0, bias)
        _ = int(chk(pcm))
        best = min(best, time.perf_counter() - t0)
    xrt = K * B * n * 256 / 48000.0 / best
    print(f"hilo={hilo} bb={bb}  {best * 1000 / K:8.2f} ms/call"
          f"  ({xrt:,.0f}x)", flush=True)


for bb in (None, 2, 4, 8):
    for hilo in (False, True):
        case(hilo, bb)
