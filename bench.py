"""Benchmark: batched 5.1 AC-3 decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config 2 of BASELINE.json: N concurrent 5.1 streams, DRC on, downmixed to
2.0, int16 output.  One jit call decodes a multi-frame chunk for all N
streams; timing uses a device-side checksum fetched to the host as the
barrier (plain block_until_ready is unreliable through the axon tunnel),
best of 5 steady-state calls, warmed up with the identical sequence.
vs_baseline is against the 10,000x-realtime north star.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np


def load_blocks(nframes: int):
    """Real coded content from the golden 5.1 stream, tiled to nframes."""
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.host.native import NativeParser
    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden", "bench_51_448.ac3")
    es = open(golden, "rb").read()
    p = NativeParser()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    blocks, meta = p.decode_frames(es * ((nframes // 8) + 1), nframes,
                                   flags, 1.0, 384.0)
    blocks = {k: v[: nframes * 6] for k, v in blocks.items()}
    return blocks, meta


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.models.decoder import StreamFormat
    from ac3acm_tpu.parallel.pipeline import batched_pipeline, init_batched_carry

    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    nframes = int(os.environ.get("BENCH_FRAMES", "64"))
    nblk = nframes * 6

    blocks1, meta = load_blocks(nframes)
    fmt = StreamFormat(acmod=meta["acmod"], output=meta["output"],
                       slev_zero=meta["slev"] == 0.0,
                       chanbias=meta["chanbias"])
    from ac3acm_tpu.models.decoder import premix_blocks, steady_ok
    # scan-free fast body when the chunk qualifies (bit-identical; the
    # golden stream is all long blocks, so the short-matrix matmul is
    # skipped too); host premix ships only the output planes
    steady = steady_ok(fmt, blocks1)
    long_only = steady and not np.asarray(blocks1["blksw"]).any()
    premixed = steady and fmt.nf_out < fmt.nfchans
    fused = (premixed and long_only
             and os.environ.get("BENCH_NO_PALLAS", "") != "1")
    chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    if fused:
        # Pallas fused kernel: matmul + OLA + int16 in VMEM, zd never
        # touches HBM (ops/pallas_steady.py); same equivalence class as
        # the XLA path vs the reference (+-1 LSB where the bias-384 grid
        # rounds a ~1e-7 float difference across a boundary)
        from ac3acm_tpu.ops.pallas_steady import fused_steady
        pre = premix_blocks(fmt, blocks1)
        freq1 = np.moveaxis(pre["freq"], -2, 0)      # plane-major [P, n, 256]
        P = freq1.shape[0]
        freq = jnp.asarray(np.broadcast_to(freq1, (batch,) + freq1.shape)
                           .copy())
        bias_d = jnp.asarray(np.broadcast_to(pre["bias"], (batch, nblk))
                             .copy())
        d0 = jnp.zeros((batch, P, 128), jnp.float32)
        fn = jax.jit(fused_steady)

        for _ in range(2):
            pcm, d0 = fn(freq, d0, bias_d)
            _ = int(chk(pcm))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            pcm, d0 = fn(freq, d0, bias_d)
            _ = int(chk(pcm))
            times.append(time.perf_counter() - t0)
        dt = min(times)
    else:
        if premixed:
            blocks1 = premix_blocks(fmt, blocks1)
        blocks = jax.tree.map(
            lambda x: jnp.asarray(np.broadcast_to(x, (batch,) + x.shape)
                                  .copy()),
            blocks1)
        fn = batched_pipeline(fmt, emit_int16=True, steady=steady,
                              long_only=long_only, premixed=premixed)
        carry = init_batched_carry(batch)
        for _ in range(2):                   # warmup incl. the barrier
            carry, pcm = fn(carry, blocks)
            _ = int(chk(pcm))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            carry, pcm = fn(carry, blocks)
            _ = int(chk(pcm))
            times.append(time.perf_counter() - t0)
        dt = min(times)

    audio_seconds = batch * nblk * 256 / 48000.0
    rtf = audio_seconds / dt
    print(f"bench: {batch} streams x {nframes} frames/call, "
          f"best {dt * 1000:.1f} ms/call (runs: "
          f"{[round(t * 1000) for t in times]} ms)", file=sys.stderr)
    print(json.dumps({
        "metric": "batched 5.1->2.0 decode realtime factor per chip (device pipeline)",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
