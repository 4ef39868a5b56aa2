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

from .. import tables as T
from ..host import pack as PK
from ..models.encoder import EncoderConfig, encode_pipeline, make_config


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
