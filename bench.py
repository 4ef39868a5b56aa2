"""Benchmark: batched 5.1 AC-3 decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config 2 of BASELINE.json: N concurrent 5.1 streams, DRC on, downmixed to
2.0.  Metric is the aggregate realtime factor per chip for the device
decode pipeline (dequant -> rematrix -> IMDCT filterbank -> downmix ->
int16), steady-state, host pre-pass pipelined on CPU threads.
vs_baseline is against the 10,000x-realtime north star.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.models.decoder import StreamFormat
    from ac3acm_tpu.parallel.pipeline import batched_pipeline, init_batched_carry
    from ac3acm_tpu.host.parse import A52Parser
    from ac3acm_tpu.models.decoder import _stack_blocks

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    nblk = 6                      # one frame per step
    reps = int(os.environ.get("BENCH_REPS", "50"))

    # Real coded content: decode the committed golden 5.1 stream to build
    # genuine per-block tensors, then tile them across the batch.
    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tests", "golden", "bench_51_448.ac3")
    fmt = StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO,
                       slev_zero=False, chanbias=31)
    if os.path.exists(golden):
        es = open(golden, "rb").read()
        parser = A52Parser()
        frames = []
        pos = 0
        from ac3acm_tpu.host.parse import syncinfo, downmix_coeff
        while pos + 7 <= len(es) and len(frames) < 8:
            size, _, _, _ = syncinfo(es[pos:pos + 7])
            if size == 0:
                pos += 1
                continue
            frames.append(parser.decode_frame(
                es[pos:pos + size], T.A52_STEREO | T.A52_ADJUST_LEVEL, 1.0, 384.0))
            pos += size
        s = parser.s
        fmt = StreamFormat(acmod=s.acmod, output=s.output,
                           slev_zero=bool(s.slev == 0.0),
                           chanbias=int(downmix_coeff(s.acmod, s.output, 1.0,
                                                      s.clev, s.slev)[1]))
        one = _stack_blocks(frames[:1])
    else:
        rng = np.random.default_rng(0)
        one = {
            "q": rng.standard_normal((nblk, 6, 256)).astype(np.float32),
            "a": np.full((nblk, 6, 256), 2.0 ** -15, np.float32),
            "b": np.ones((nblk, 6, 256), np.float32),
            "blksw": np.zeros((nblk, 5), bool),
            "coeff": np.ones((nblk, 5), np.float32),
            "remat": np.zeros((nblk, 256), bool),
            "bias": np.full(nblk, 384.0, np.float32),
        }

    import jax.numpy as jnp
    blocks = jax.tree.map(
        lambda x: jnp.asarray(np.broadcast_to(x, (batch,) + x.shape).copy()), one)
    fn = batched_pipeline(fmt, emit_int16=True)
    carry = init_batched_carry(batch)

    # warmup / compile
    carry, pcm = fn(carry, blocks)
    jax.block_until_ready(pcm)

    t0 = time.perf_counter()
    for _ in range(reps):
        carry, pcm = fn(carry, blocks)
    jax.block_until_ready(pcm)
    dt = time.perf_counter() - t0

    audio_seconds = reps * batch * nblk * 256 / 48000.0
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "batched 5.1->2.0 decode realtime factor per chip (device pipeline)",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
