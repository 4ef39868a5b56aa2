"""Batched multi-stream encode: N streams x one frame per device step.

The encoder device pipeline (models.encoder.encode_pipeline) is natively
batched; this wrapper manages per-stream carries, shards the batch over the
mesh 'data' axis, and fans the host bit-packing out over threads (the only
serial-per-stream stage).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..host import pack as PK
from ..models.encoder import (encode_pipeline,
                              encode_pipeline_multi, make_config)


class BatchedEncoder:
    """N same-format PCM streams -> N AC-3 streams."""

    def __init__(self, batch: int, freq: int, bitrate: int, channels: int,
                 mesh=None, pack_threads: int = 8):
        self.batch = batch
        self.cfg = make_config(freq, bitrate, channels)
        self.mesh = mesh
        self._fn = encode_pipeline(self.cfg)
        if mesh is not None:
            shard = NamedSharding(mesh, P("data"))
            self._fn = jax.jit(self._fn,
                               in_shardings=(shard, shard, shard))
        self.last = jnp.zeros((batch, channels, 256), jnp.int32)
        self.csnr = jnp.full((batch,), 40, jnp.int32)
        self._pool = ThreadPoolExecutor(pack_threads)

    def encode_step(self, pcm: np.ndarray) -> list[bytes]:
        """pcm int16 [batch, 1536, nch] (AC-3 channel order) -> frames."""
        res = self._fn(jnp.asarray(pcm, jnp.int32), self.last, self.csnr)
        res = {k: np.asarray(v) for k, v in res.items()}
        if not res["ok"].all():
            bad = np.nonzero(~res["ok"])[0]
            raise RuntimeError(f"rate control failed for streams {bad[:8]}")
        self.last = jnp.asarray(res["new_last"])
        self.csnr = jnp.asarray(res["new_csnr"])
        return list(self._pool.map(
            lambda b: PK.pack_frame(self.cfg, res, b), range(self.batch)))

    def encode_frames(self, pcm: np.ndarray) -> list[bytes]:
        """Multi-frame step: pcm int16 [batch, F*1536, nch] -> concatenated
        AC-3 bytes per stream.  One device dispatch for all F frames
        (lax.scan carries last_samples/csnroffst; bit-identical to F
        encode_step calls, ~2x the aggregate throughput)."""
        B, n, nch = pcm.shape
        F = n // 1536
        frames = np.asarray(pcm, np.int32).reshape(B, F, 1536, nch)
        frames = np.moveaxis(frames, 1, 0)               # [F, B, 1536, nch]
        fn = encode_pipeline_multi(self.cfg)
        (last, csnr), outs = fn(jnp.asarray(frames), self.last, self.csnr)
        outs = {k: np.asarray(v) for k, v in outs.items()}
        if not outs["ok"].all():
            bad = np.argwhere(~outs["ok"])
            raise RuntimeError(f"rate control failed at (frame,stream) "
                               f"{bad[:8].tolist()}")
        self.last, self.csnr = last, csnr

        def pack_stream(b):
            return b"".join(
                PK.pack_frame(self.cfg, {k: v[f] for k, v in outs.items()}, b)
                for f in range(F))
        return list(self._pool.map(pack_stream, range(self.batch)))
