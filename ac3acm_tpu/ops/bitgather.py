"""Pallas windowed bitfield gather: the device half of bitstream unpack.

Extracts many variable-width (<=16 bit) fields from per-row byte buffers
at monotone bit offsets.  This is the primitive under the raw-H2D decode
path (ops.unpack_device): the host ships raw AC-3 frame bytes + side-info
offsets, and the device pulls exponent groups, coupling coordinates and
mantissa codes out of the bits itself (reference semantics:
/root/reference/a52dec-0.7.5-cvs/liba52/bitstream.h:53-77, re-expressed
as a batched gather rather than a cursor).

XLA's gather HLO runs at ~0.03 Gslot/s on v5e at these shapes (measured)
-- slower than one host core.  This kernel instead exploits that offsets
are monotone within each 128-slot tile, so every tile's fields live in a
small window of the buffer:

  * a p24 plane (24-bit little window at every byte position, < 2^24 so
    exact in f32) is precomputed once per buffer outside the kernel,
  * the window is a dynamic few-row slice of the [rows, 128] p24 image
    (sublane-dim pl.ds; start rows scalar-prefetched),
  * per-slot selection decomposes by radix: a [slots, 128] lane one-hot
    f32 matmul picks the column (exact -- each output sums one one-hot
    product), then a per-row select picks the window row,
  * the <=16-bit field is then shifted/masked out on the VPU, exactly
    BitReader.gather's arithmetic (host/bitio.py:53-68).

Each grid step handles 8 tiles (Mosaic wants >=8 sublanes per block),
each tile with its own window.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# trace-time knob: run pallas_call in interpreter mode (CPU tests)
INTERPRET = False

TS = 128                 # slots per tile (lane dim)
TPG = 8                  # tiles per grid step (sublane dim)


def _kernel(win_rows, flat, starts_ref, p24_ref, offs_ref, widths_ref,
            out_ref):
    u = pl.program_id(1)
    fr = flat // 128                                      # window rows
    rows = []
    wins = []
    for r in range(TPG):
        row = starts_ref[0, 0, u * TPG + r]
        rows.append(row)
        wins.append(p24_ref[0, pl.ds(row, fr), :])        # [fr, 128] f32
    win = jnp.stack(wins, axis=0)                         # [8, fr, 128]
    offs = offs_ref[0]                                    # [8, 128]
    base = jnp.stack(rows).astype(jnp.int32).reshape(TPG, 1)
    within = (offs >> 3) - base * 128                     # [8, 128]
    # radix gather: the precomputed p24 plane holds the 24-bit window at
    # every byte position (values < 2^24, exact in f32), so selecting a
    # byte position decomposes into a lane one-hot matmul (low 7 bits)
    # plus a row select (high bits).  Each matmul output picks exactly
    # one p24 entry -- products and sums are exact in f32.
    lo = within & 127
    hi = within >> 7
    lane = jax.lax.broadcasted_iota(jnp.int32, (TPG, TS, 128), 2)
    oh = (lane == lo[..., None]).astype(jnp.float32)      # [8, TS, 128]
    t = jax.lax.dot_general(
        win, oh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        # HIGHEST: default TPU precision truncates the 24-bit p24 values
        # to one bf16 pass; the multi-pass form is exact for f32 ints
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)               # [8, fr, TS]
    w24 = jnp.zeros((TPG, TS), jnp.float32)
    for h in range(fr):
        w24 = jnp.where(hi == h, t[:, h, :], w24)
    w24 = w24.astype(jnp.int32)
    widths = widths_ref[0]
    shift = 24 - (offs & 7) - widths
    val = (w24 >> shift) & ((jnp.int32(1) << widths) - 1)
    out_ref[0] = val


@lru_cache(maxsize=64)
def _build(N: int, T: int, rows: int, shared: bool, win_rows: int,
           flat: int):
    byte_idx = ((lambda n, u: (0, 0, 0)) if shared
                else (lambda n, u: (n, 0, 0)))
    grid_spec = pl.GridSpec(
        grid=(N, T // TPG),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda n, u: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, 128), byte_idx),
            pl.BlockSpec((1, TPG, TS), lambda n, u: (n, u, 0)),
            pl.BlockSpec((1, TPG, TS), lambda n, u: (n, u, 0)),
        ],
        out_specs=pl.BlockSpec((1, TPG, TS), lambda n, u: (n, u, 0)),
    )
    return pl.pallas_call(
        partial(_kernel, win_rows, flat),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, T, TS), jnp.int32),
        # Mosaic on TPU; interpreter everywhere else (CPU test backend)
        interpret=INTERPRET or jax.default_backend() != "tpu",
    )


def _to_p24(data, slack_rows):
    """[*, MB] uint8 -> [*, rows, 128] f32 of 24-bit byte windows:
    p24[p] = b[p]<<16 | b[p+1]<<8 | b[p+2] (values < 2^24, exact f32)."""
    MB = data.shape[-1]
    rows = -(-(MB + 2) // 128) + slack_rows
    pad = rows * 128 - MB
    d = jnp.pad(data, [(0, 0)] * (data.ndim - 1)
                + [(0, pad)]).astype(jnp.int32)
    p24 = (d[..., :-2] << 16) | (d[..., 1:-1] << 8) | d[..., 2:]
    p24 = jnp.pad(p24, [(0, 0)] * (data.ndim - 1) + [(0, 2)])
    return p24.reshape(data.shape[:-1] + (rows, 128)).astype(jnp.float32)


def _run(data_rows, offsets, widths, shared: bool, win_rows: int,
         flat: int):
    N, S = offsets.shape
    T = -(-S // (TPG * TS)) * TPG
    pad = T * TS - S
    if pad:
        offsets = jnp.concatenate(
            [offsets, jnp.broadcast_to(offsets[:, -1:], (N, pad))], axis=1)
        widths = jnp.concatenate(
            [widths, jnp.zeros((N, pad), jnp.int32)], axis=1)
    # window row per tile, from the tile MIN: offsets need not be fully
    # monotone within a tile (dither rank lattices sawtooth by a few
    # slots), only bounded -- the span must still fit the window
    starts = (offsets.reshape(N, T, TS).min(axis=2) >> 10).reshape(N, 1, T)
    offsets = offsets.reshape(N, T, TS)
    widths = widths.reshape(N, T, TS)
    rows = data_rows.shape[1]
    out = _build(N, T, rows, shared, win_rows, flat)(
        starts, data_rows, offsets, widths)
    return out.reshape(N, T * TS)[:, :S]


def extract_fields(data, offsets, widths):
    """data [N, MB] uint8; offsets/widths [N, S] int32 (bit offsets,
    widths 0..16).  Returns [N, S] int32 unsigned field values.

    Requirements (ops.unpack_device enforces):
      * within each 128-slot tile, offsets span <= 128*16 = 2048 bits
        past the tile minimum (so the fields fit the 512-byte window),
      * inactive slots carry a nearby active offset (width 0 -> value 0).
    """
    return _run(_to_p24(data, 5), offsets, widths, shared=False,
                win_rows=5, flat=512)


def extract_fields_shared(table, offsets, widths=None, span_rows=14):
    """Gather 16-bit fields from ONE shared byte table for all rows.

    table [TB] uint8; offsets [N, S] int32 bit offsets.  Per 128-slot
    tile the offsets may span up to (span_rows-3)*128 bytes -- the dither
    orbit needs wider windows than mantissa fields because coupled blocks
    draw up to 5 dither words per slot."""
    N, S = offsets.shape
    if widths is None:
        widths = jnp.full((N, S), 16, jnp.int32)
    tab = _to_p24(table[None, :], span_rows)
    flat = (span_rows - 2) * 128
    return _run(tab, offsets, widths, shared=True, win_rows=span_rows,
                flat=flat)


def reference_extract(data: np.ndarray, offsets: np.ndarray,
                      widths: np.ndarray) -> np.ndarray:
    """numpy oracle (BitReader.gather semantics) for tests."""
    N = data.shape[0]
    out = np.zeros(offsets.shape, np.int32)
    from ..host.bitio import BitReader
    for n in range(N):
        br = BitReader(data[n].tobytes())
        out[n] = br.gather(offsets[n].astype(np.int64),
                           widths[n].astype(np.int64)).astype(np.int32)
    return out
