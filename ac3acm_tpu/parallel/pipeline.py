"""Batched multi-stream decode: the framework's throughput path.

The ACM driver handles one stream per instance (AC3ACM.cpp:92-102); here N
streams of a common format are a leading batch axis, vmapped through the
per-stream block scan and sharded across the mesh's 'data' axis (pjit /
NamedSharding -- XLA lays the batch over ICI).  An optional 'model' axis
tensor-parallelizes the filterbank contraction with an explicit psum
(shard_map), for configurations where a single stream batch spans chips.

Per-stream carried state (OLA delay planes + downmixed flag) is the
checkpoint/resume unit: a plain pytree, serializable with orbax or numpy.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import tables as T
from ..models.decoder import (StreamFormat, _pipeline_body, _pipeline_steady,
                              steady_ok)
from ..ops.filterbank import convert_to_int16



from functools import lru_cache


@lru_cache(maxsize=64)
def batched_pipeline(fmt: StreamFormat, mesh=None, emit_int16: bool = False,
                     steady: bool = False, long_only: bool = False,
                     premixed: bool = False):
    """Returns jitted fn: (carry, blocks) -> (carry, pcm).

    carry: (delay [B,6,128] f32, downmixed [B] bool)
    blocks: pytree with leading [B, nblk, ...] axes.
    pcm: [B, nblk, nch_out, 256] float32 (or int16 when emit_int16).

    steady=True selects the scan-free fast body (bit-identical on chunks
    that pass models.decoder.steady_ok -- dispatch per call on the host);
    long_only=True additionally skips the short-block matmul (valid when
    no block in the chunk is short -- also host-checked).
    """
    if steady:
        body = partial(_pipeline_steady, long_only=long_only,
                       premixed=premixed)
    else:
        body = _pipeline_body

    def run(carry, blocks):
        carry, pcm = jax.vmap(partial(body, fmt))(carry, blocks)
        if emit_int16:
            pcm = convert_to_int16(pcm)
        return carry, pcm

    if mesh is None:
        return jax.jit(run)
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(run, in_shardings=(shard, shard), out_shardings=(shard, shard))


def init_batched_carry(batch: int, mesh=None):
    delay = jnp.zeros((batch, 6, 128), jnp.float32)
    downmixed = jnp.ones((batch,), bool)
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
        delay = jax.device_put(delay, shard)
        downmixed = jax.device_put(downmixed, shard)
    return delay, downmixed


# ---------------------------------------------------------------------------
# Tensor-parallel filterbank step (shard_map + psum) for the multi-chip
# transcode configuration: frequency contraction split over 'model'.
# ---------------------------------------------------------------------------

def tp_filterbank(mesh, coeffs, delay, blksw, bias):
    """coeffs [..., 256] sharded on last axis over 'model'; explicit psum.

    Demonstrates the collective layout for the 1024-stream transcode config
    (BASELINE.json config 5): each 'model' shard holds 256/m frequency rows
    of the IMDCT matrices, computes a partial [..., 384] product, and a
    psum over 'model' reduces to the full time-domain signal.
    """
    from jax.experimental.shard_map import shard_map
    from ..ops.filterbank import _mats

    w_long, w_short, win = _mats()
    m = mesh.shape["model"]

    def step(c_shard, delay_full, blksw_full, bias_full):
        # c_shard: [..., 256//m]; local slice of the contraction axis
        idx = jax.lax.axis_index("model")
        rows = 256 // m
        wl = jax.lax.dynamic_slice_in_dim(jnp.asarray(w_long), idx * rows, rows, 0)
        ws = jax.lax.dynamic_slice_in_dim(jnp.asarray(w_short), idx * rows, rows, 0)
        blk = blksw_full[..., None]
        cl = jnp.where(blk, 0.0, c_shard)
        cs = jnp.where(blk, c_shard, 0.0)
        partial_zd = (jnp.matmul(cl, wl, precision=jax.lax.Precision.HIGHEST)
                      + jnp.matmul(cs, ws, precision=jax.lax.Precision.HIGHEST))
        zd = jax.lax.psum(partial_zd, "model")
        z, dnew = zd[..., :256], zd[..., 256:]
        wv = jnp.asarray(win)
        dfold = jnp.concatenate([delay_full, delay_full[..., ::-1]], axis=-1)
        out = z * wv + dfold * wv[::-1] + bias_full[..., None]
        return out, dnew

    return shard_map(
        step, mesh=mesh,
        in_specs=(P("data", None, "model"), P("data", None, None),
                  P("data", None), P("data", None)),
        out_specs=(P("data", None, None), P("data", None, None)),
    )(coeffs, delay, blksw, bias)


# ---------------------------------------------------------------------------
# Host-side pool: N parsers feeding the batched device pipeline
# ---------------------------------------------------------------------------

@dataclass
class StreamLane:
    parser: object
    buf: bytes = b""
    pos: int = 0
    ok: bool = True          # failure-detection lane mask
    # parsed-but-not-yet-emitted FrameData (uneven lane feeds leave a
    # remainder here; the next decode_available resumes with it instead
    # of dropping consumed frames)
    pending: list = None

    def __post_init__(self):
        if self.pending is None:
            self.pending = []


class BatchedDecoder:
    """N same-format streams -> batched PCM.

    Per-stream failure handling follows the reference's resync strategy
    (a52dec.c:271-306): a bad frame marks the lane invalid for that frame
    (its PCM is zeroed) instead of failing the batch.
    """

    def __init__(self, batch: int, flags: int, level: float = 1.0,
                 bias: float = 0.0, mesh=None, emit_int16: bool = False):
        from ..host.parse import A52Parser
        self.lanes = [StreamLane(parser=A52Parser()) for _ in range(batch)]
        self.flags = flags
        self.level = level
        self.bias = bias
        self.mesh = mesh
        self.emit_int16 = emit_int16
        self._fmt = None
        self._fn = None
        self._carry = init_batched_carry(batch, mesh)

    def feed(self, lane: int, data: bytes):
        self.lanes[lane].buf += data

    def _next_frame(self, lane: StreamLane):
        from ..host.parse import syncinfo
        buf, pos = lane.buf, lane.pos
        while pos + 7 <= len(buf):
            size, _, _, _ = syncinfo(buf[pos:pos + 7])
            if size == 0:
                pos += 1
                continue
            if pos + size > len(buf):
                break
            frame = buf[pos:pos + size]
            lane.pos = pos + size
            return frame
        lane.pos = pos
        return None

    def decode_available(self, max_frames: int = 8):
        """Parse up to max_frames per lane, run the device pipeline once.

        Returns (pcm [B, nblk, nch, 256], valid [B, nframes] bool) or None
        if no lane had a complete frame.
        """
        from ..models.decoder import _stack_blocks
        for lane in self.lanes:
            while len(lane.pending) < max_frames:
                fb = self._next_frame(lane)
                if fb is None:
                    break
                try:
                    lane.pending.append(self.parser_decode(lane, fb))
                except Exception:
                    lane.pending.append(None)  # bad frame: masked lane-frame
        nf = min((len(l.pending) for l in self.lanes), default=0)
        if nf == 0:
            return None
        per_lane = [lane.pending[:nf] for lane in self.lanes]
        for lane in self.lanes:
            del lane.pending[:nf]
        valid = np.ones((len(self.lanes), nf), bool)
        stacked = []
        first = None                 # first valid FrameData in the batch
        for li, frames in enumerate(per_lane):
            fixed = []
            for fi, f in enumerate(frames):
                if f is None:
                    valid[li, fi] = False
                    fixed.append(self._empty_frame())
                else:
                    if first is None:
                        first = f
                    fixed.append(f)
            stacked.append(_stack_blocks(fixed))
        blocks = jax.tree.map(lambda *xs: np.stack(xs), *stacked)

        # format from the frames actually being emitted (the live parser
        # state may already be ahead, on pending frames kept for later)
        if first is not None:
            fmt = StreamFormat(acmod=first.acmod, output=first.output,
                               slev_zero=bool(first.slev == 0.0),
                               chanbias=int(first.blocks[0].chanbias))
        else:
            s = self.lanes[0].parser.s
            from ..host.parse import downmix_coeff
            fmt = StreamFormat(acmod=s.acmod, output=s.output,
                               slev_zero=bool(s.slev == 0.0),
                               chanbias=int(downmix_coeff(
                                   s.acmod, s.output, 1.0, s.clev, s.slev)[1]))
        if steady_ok(fmt, blocks):
            from ..models.decoder import premix_blocks
            lo = not np.asarray(blocks["blksw"]).any()
            pre = fmt.nf_out < fmt.nfchans
            if pre:
                blocks = premix_blocks(fmt, blocks)
            fn = batched_pipeline(fmt, self.mesh, self.emit_int16,
                                  steady=True, long_only=lo, premixed=pre)
        else:
            fn = batched_pipeline(fmt, self.mesh, self.emit_int16)
        self._fmt = fmt
        self._carry, pcm = fn(self._carry, blocks)
        return pcm, valid

    def parser_decode(self, lane: StreamLane, frame: bytes):
        return lane.parser.decode_frame(frame, self.flags, self.level, self.bias)

    def _empty_frame(self):
        from ..host.parse import BlockData, FrameData
        z = np.zeros((6, 256), np.float32)
        blk = BlockData(q=z, a=z, b=z, blksw=np.zeros(5, bool),
                        coeff=np.zeros(5, np.float32), chanbias=0,
                        remat_mask=np.zeros(256, bool),
                        lfe_scale=np.float32(0))
        s = self.lanes[0].parser.s
        return FrameData(acmod=s.acmod, lfeon=s.lfeon, output=s.output,
                         nfchans=int(T.NFCHANS[s.acmod]), bias=np.float32(self.bias),
                         blocks=[blk] * 6)
