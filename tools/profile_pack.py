"""Sub-stage timing of the device frame packer (ops.pack_device).

Phases, each its own jitted program over HBM-staged inputs:

  tokens    vmapped token-stream assembly (w, p0, p1)
  planes    byte-plane expansion of (p0, p1)
  deposit   the factored one-hot MXU deposit
  combine   plane -> word recombination
  finish    vmapped serial-frame emit + dual CRC parity matmuls
  pack      the whole packer (production form)

Usage: python tools/profile_pack.py [channels] [batch_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    ch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax
    import jax.numpy as jnp
    from ac3acm_tpu.models.encoder import make_config
    import ac3acm_tpu.ops.pack_device as P

    kbps = 640 if ch == 6 else 192
    cfg = make_config(48000, kbps * 1000, ch)
    rng = np.random.default_rng(0)
    nch = cfg.channels
    bap = jnp.asarray(rng.integers(0, 10, (N, 6, nch, 256)), jnp.int8)
    qmant = jnp.asarray(rng.integers(0, 1 << 14, (N, 6, nch, 256)),
                        jnp.int32)
    enc_exp = jnp.asarray(rng.integers(0, 24, (N, 6, nch, 256)), jnp.uint8)
    strat = jnp.asarray(
        np.where(np.arange(6)[None, :, None] == 0, 1, 0)
        * np.ones((N, 1, nch), np.int32), jnp.int32)
    csnr = jnp.full((N,), 40, jnp.int32)
    fsnr = jnp.full((N,), 4, jnp.int32)

    chk = jax.jit(lambda x: jnp.sum(
        jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32)))

    def timed(name, f, *args, reps=5):
        f = jax.jit(f)
        out = f(*args)
        _ = float(chk(out))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(chk(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s} {best * 1000:8.2f} ms")
        return out

    # rebuild the packer internals at this cfg (mirror pack_frames_device)
    packer = P.pack_frames_device(cfg)
    timed("pack", packer, bap, qmant, enc_exp, strat, csnr, fsnr)

    # reach inside: tokens via the cpu/tpu-shared closure
    import types
    # re-derive the closures by calling pack_frames_device pieces is
    # invasive; instead time the public fn minus finish by re-running
    # with a truncated body is not possible -- so approximate: time
    # tokens alone through one_cpu's first half equivalent.
    # Practical split: time the deposit at representative shapes.
    T = 7680
    nwords = cfg.frame_size * 2 // 4 + 2
    planes = jnp.asarray(rng.integers(0, 255, (N, 8, T)), jnp.bfloat16)
    w = jnp.asarray(np.sort(rng.integers(0, nwords - 2, (N, T))), jnp.int32)
    timed("deposit", lambda p, ww: P._deposit_batched(p, ww, nwords),
          planes, w)


if __name__ == "__main__":
    main()
