"""Microbench: XLA cumsum/cummax vs blocked triangular-matmul cumsum.

Chains K=8 dependent iterations inside one jit so the ~25 ms axon
dispatch latency amortizes out; prints per-iteration device time.
Feedback `% 17` keeps values small/exact for the bf16 matmul contract.

Usage: python tools/micro_cumsum.py [L]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from ac3acm_tpu.ops.unpack_device import _cumsum

L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = 8
x = jax.jit(lambda k: jax.random.randint(k, (L, 96, 2688), 0, 17,
                                         jnp.int32))(jax.random.PRNGKey(0))
chk = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def timed(name, f):
    def loop(v):
        for _ in range(K):
            v = f(v) % 17
        return v
    g = jax.jit(loop)
    out = g(x)
    _ = float(chk(out))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(chk(g(x)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best * 1000 / K:8.2f} ms/iter", flush=True)


timed("xla_cumsum_excl", lambda v: jnp.cumsum(v, -1) - v)
timed("matmul_b128", lambda v: _cumsum(v, exclusive=True, block=128))
timed("matmul_b512", lambda v: _cumsum(v, exclusive=True, block=512))
a = np.asarray(jax.jit(lambda v: jnp.cumsum(v, -1) - v)(x))
b = np.asarray(jax.jit(lambda v: _cumsum(v, exclusive=True))(x))
assert np.array_equal(a, b)
timed("xla_cummax", lambda v: jax.lax.cummax(v, axis=2))
print("exact OK")
