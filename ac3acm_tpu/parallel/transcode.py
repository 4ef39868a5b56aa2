"""Transcode pipeline: N-stream AC-3 decode -> downmix -> re-encode.

BASELINE.json config 5.  One fused jit step per frame batch: the decoder's
block scan produces PCM, the int16 conversion and the encoder's
window/MDCT/exponent/rate-control stages consume it directly on device --
no host round trip between the codecs.  Host work is parse-in (native C++
pre-pass) and pack-out (bit packing + CRC).

Sharded over the mesh 'data' axis like the decode pipeline; carries are
(decoder delay/downmixed, encoder last_samples/csnroffst) per stream.
"""
from __future__ import annotations


from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import tables as T
from ..models.decoder import StreamFormat, _pipeline_body
from ..models.encoder import EncoderConfig
from ..ops.filterbank import convert_to_int16


def _make_run(dec_fmt: StreamFormat, enc_cfg: EncoderConfig):
    from ..models.encoder import _frame_body

    enc_fn = _frame_body(enc_cfg)

    def one_stream(carry, blocks):
        return _pipeline_body(dec_fmt, carry, blocks)

    # decoder plane order -> AC-3 coded channel order for the encoder:
    # with LFE the decoder puts it in plane 0 but the encoder codes it last
    nch = dec_fmt.nch_out
    perm = list(range(1, nch)) + [0] if dec_fmt.lfe_out else list(range(nch))

    def run(dec_carry, blocks, enc_last, enc_csnr):
        dec_carry, pcm = jax.vmap(one_stream)(dec_carry, blocks)
        i16 = convert_to_int16(pcm)                    # [B, 6, nch, 256]
        i16 = i16[:, :, jnp.asarray(perm), :]
        samples = i16.transpose(0, 1, 3, 2).reshape(
            pcm.shape[0], 6 * 256, nch).astype(jnp.int32)
        enc = enc_fn(samples, enc_last, enc_csnr)
        return dec_carry, enc, i16

    return run


@lru_cache(maxsize=8)
def transcode_pipeline(dec_fmt: StreamFormat, enc_cfg: EncoderConfig,
                       mesh=None):
    """jitted: (dec_carry, blocks, enc_last, enc_csnr) ->
    (dec_carry', enc_fields, pcm_i16)

    blocks: decoder block tensors [B, 6, ...] (one frame per stream).
    The decoded PCM (bias must be 384 in the parse) becomes the encoder's
    input frame.  Decoder output channel count must equal enc_cfg.channels.
    """
    run = _make_run(dec_fmt, enc_cfg)
    if mesh is None:
        return jax.jit(run)
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(run, in_shardings=(shard, shard, shard, shard),
                   out_shardings=(shard, shard, shard))


@lru_cache(maxsize=8)
def transcode_pipeline_multi(dec_fmt: StreamFormat, enc_cfg: EncoderConfig):
    """jitted multi-frame transcode: scans the fused decode->re-encode step
    over F frames carrying both codecs' state -- one device dispatch for
    the whole chunk, identical sequential semantics."""
    run = _make_run(dec_fmt, enc_cfg)

    def multi(dec_carry, blocks, enc_last, enc_csnr):
        def step(carry, blk):
            dc, last, csnr = carry
            dc, enc, _ = run(dc, blk, last, csnr)
            return (dc, enc["new_last"], enc["new_csnr"]), enc
        return jax.lax.scan(step, (dec_carry, enc_last, enc_csnr), blocks)

    return jax.jit(multi)


class Transcoder:
    """N same-format streams: AC-3 in -> AC-3 out (re-encode at new rate)."""

    def __init__(self, batch: int, out_bitrate: int, out_channels: int,
                 sample_rate: int = 48000, mesh=None, pack: str = "device"):
        from ..host.native import NativeParser
        from ..models.encoder import make_config
        from ..ops.pack_device import pack_frames_device
        self.batch = batch
        self.enc_cfg = make_config(sample_rate, out_bitrate, out_channels)
        self.mesh = mesh
        self.parsers = [NativeParser() for _ in range(batch)]
        self.dec_carry = (jnp.zeros((batch, 6, 128), jnp.float32),
                          jnp.ones((batch,), bool))
        self.enc_last = jnp.zeros((batch, out_channels, 256), jnp.int32)
        self.enc_csnr = jnp.full((batch,), 40, jnp.int32)
        self.out_channels = out_channels
        self._fn = None
        self._fmt = None
        assert pack in ("device", "native")
        self._pack_fn = pack_frames_device(self.enc_cfg) \
            if pack == "device" else None

    def _pack(self, enc) -> list[bytes]:
        """enc fields [B, ...] or [F, B, ...] -> flat C-order frame list."""
        from ..host import pack as PK
        if self._pack_fn is not None:
            fr = np.asarray(self._pack_fn(
                enc["bap"], enc["qmant"], enc["enc_exp"], enc["strat"],
                enc["csnroffst"], enc["fsnroffst"]))
            fr = fr.reshape(-1, fr.shape[-1])
            return [fr[i].tobytes() for i in range(fr.shape[0])]
        enc_h = {k: np.asarray(v) for k, v in enc.items()}
        return PK.pack_frames_native(self.enc_cfg, enc_h)

    def step(self, frames: list[bytes]):
        """One frame per stream in; one re-encoded frame per stream out."""
        assert len(frames) == self.batch
        # decode request: match the encoder channel count
        want = {1: T.A52_MONO, 2: T.A52_STEREO, 3: T.A52_3F,
                4: T.A52_2F2R, 5: T.A52_3F2R,
                6: T.A52_3F2R | T.A52_LFE}[self.out_channels]
        flags = want | T.A52_ADJUST_LEVEL
        allb = [p.decode_frames(fb, 1, flags, 1.0, 384.0)
                for p, fb in zip(self.parsers, frames)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs),
                               *[b for b, _ in allb])
        meta = allb[0][1]
        fmt = StreamFormat(acmod=meta["acmod"], output=meta["output"],
                           slev_zero=meta["slev"] == 0.0,
                           chanbias=meta["chanbias"])
        if fmt != self._fmt:
            self._fmt = fmt
            self._fn = transcode_pipeline(fmt, self.enc_cfg, self.mesh)
        self.dec_carry, enc, _ = self._fn(self.dec_carry, stacked,
                                          self.enc_last, self.enc_csnr)
        self.enc_last = enc["new_last"]
        self.enc_csnr = enc["new_csnr"]
        return self._pack(enc)

    def step_frames(self, data: list[bytes], nframes: int) -> list[bytes]:
        """Multi-frame step: data[b] holds exactly `nframes` AC-3 frames.
        One device dispatch transcodes the whole chunk (scan over frames
        carrying both codecs' state); returns re-encoded bytes per stream.
        """
        assert len(data) == self.batch
        want = {1: T.A52_MONO, 2: T.A52_STEREO, 3: T.A52_3F,
                4: T.A52_2F2R, 5: T.A52_3F2R,
                6: T.A52_3F2R | T.A52_LFE}[self.out_channels]
        flags = want | T.A52_ADJUST_LEVEL
        allb = [p.decode_frames(fb, nframes, flags, 1.0, 384.0)
                for p, fb in zip(self.parsers, data)]
        meta = allb[0][1]
        fmt = StreamFormat(acmod=meta["acmod"], output=meta["output"],
                           slev_zero=meta["slev"] == 0.0,
                           chanbias=meta["chanbias"])
        # [B] of dicts with [F*6, ...] -> [F, B, 6, ...]
        def to_fb(x):
            x = np.stack(x)                               # [B, F*6, ...]
            x = x.reshape((x.shape[0], nframes, 6) + x.shape[2:])
            return jnp.asarray(np.moveaxis(x, 1, 0))
        blocks = jax.tree.map(lambda *xs: to_fb(xs),
                              *[b for b, _ in allb])
        fn = transcode_pipeline_multi(fmt, self.enc_cfg)
        (self.dec_carry, last, csnr), enc = fn(
            self.dec_carry, blocks, self.enc_last, self.enc_csnr)
        self.enc_last, self.enc_csnr = last, csnr
        # [F, B] flattens C-order -> frame f of stream b at index f*B + b
        flat = self._pack(enc)
        return [b"".join(flat[f * self.batch + b] for f in range(nframes))
                for b in range(self.batch)]
