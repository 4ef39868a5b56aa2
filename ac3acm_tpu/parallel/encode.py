"""Batched multi-stream encode: N streams x one frame per device step.

The encoder device pipeline (models.encoder.encode_pipeline) is natively
batched; this wrapper manages per-stream carries and shards the batch over
the mesh 'data' axis.  Bit packing -- the reference's only serial-per-frame
stage (ac3enc.cpp:1194-1638) -- runs on device by default
(ops.pack_device: finished frames leave the chip as bytes, ~20x less
device->host traffic than the dense fields), with the threaded native C++
packer (native/ac3host.cpp:ac3h_pack_frames) as the host alternative.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..host import pack as PK
from ..models.encoder import (encode_pipeline,
                              encode_pipeline_multi, make_config)
from ..ops.pack_device import pack_frames_device


class BatchedEncoder:
    """N same-format PCM streams -> N AC-3 streams.

    pack: "device" (default) assembles frames on device; "native" fetches
    the dense fields and packs them in C++ threads.  Byte-identical.
    """

    def __init__(self, batch: int, freq: int, bitrate: int, channels: int,
                 mesh=None, pack: str = "device"):
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
        assert pack in ("device", "native")
        self._pack_fn = pack_frames_device(self.cfg) if pack == "device" \
            else None

    def _pack(self, res, nframes_leading: int | None = None) -> list[bytes]:
        """res fields either [B, ...] or [F, B, ...]; flat C-order list."""
        if self._pack_fn is not None:
            fr = np.asarray(self._pack_fn(
                res["bap"], res["qmant"], res["enc_exp"], res["strat"],
                res["csnroffst"], res["fsnroffst"]))
            fr = fr.reshape(-1, fr.shape[-1])
            return [fr[i].tobytes() for i in range(fr.shape[0])]
        res_h = {k: np.asarray(v) for k, v in res.items()}
        return PK.pack_frames_native(self.cfg, res_h)

    def encode_step(self, pcm: np.ndarray) -> list[bytes]:
        """pcm int16 [batch, 1536, nch] (AC-3 channel order) -> frames."""
        res = self._fn(jnp.asarray(pcm, jnp.int16), self.last, self.csnr)
        ok = np.asarray(res["ok"])
        if not ok.all():
            bad = np.nonzero(~ok)[0]
            raise RuntimeError(f"rate control failed for streams {bad[:8]}")
        self.last = res["new_last"]
        self.csnr = res["new_csnr"]
        return self._pack(res)

    def encode_frames(self, pcm: np.ndarray) -> list[bytes]:
        """Multi-frame step: pcm int16 [batch, F*1536, nch] -> concatenated
        AC-3 bytes per stream.  One device dispatch for all F frames
        (lax.scan carries last_samples/csnroffst; bit-identical to F
        encode_step calls).  With the device packer, encode + pack run as
        a single fused dispatch and only ok + finished frames return."""
        from ..models.encoder import encode_pipeline_packed
        B, n, nch = pcm.shape
        F = n // 1536
        # ship int16 (half the tunnel bytes); widened on device
        frames = np.asarray(pcm, np.int16).reshape(B, F, 1536, nch)
        frames = np.moveaxis(frames, 1, 0)               # [F, B, 1536, nch]
        if self._pack_fn is not None:
            fn = encode_pipeline_packed(self.cfg)
            (last, csnr), ok_d, fr = fn(jnp.asarray(frames),
                                        self.last, self.csnr)
            fr = np.asarray(fr)
            ok = np.asarray(ok_d)
            if not ok.all():
                bad = np.argwhere(~ok)
                raise RuntimeError(f"rate control failed at (frame,stream) "
                                   f"{bad[:8].tolist()}")
            self.last, self.csnr = last, csnr
            return [b"".join(fr[f, b].tobytes() for f in range(F))
                    for b in range(self.batch)]
        fn = encode_pipeline_multi(self.cfg)
        (last, csnr), outs = fn(jnp.asarray(frames), self.last, self.csnr)
        ok = np.asarray(outs["ok"])
        if not ok.all():
            bad = np.argwhere(~ok)
            raise RuntimeError(f"rate control failed at (frame,stream) "
                               f"{bad[:8].tolist()}")
        self.last, self.csnr = last, csnr
        # [F, B] flattens C-order: frame f of stream b at index f*B + b
        flat = self._pack(outs)
        return [b"".join(flat[f * B + b] for f in range(F))
                for b in range(self.batch)]
