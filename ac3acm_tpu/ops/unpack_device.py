"""Device-side bitstream unpack: raw AC-3 frame bytes -> dequantized planes.

The raw-H2D decode path ships each lane's coded frame bytes plus a small
per-block side-info record (ac3acm_tpu.host.parse.A52Parser(record_raw=
True)) and reconstructs everything else on the TPU:

    exponent fields --bitgather--> grouped deltas --cumsum--> exp[row, bin]
    exp + side-info --ops.alloc--> bap[row, bin]           (recompute-always)
    bap             --cumsums---> per-slot widths + bit offsets + dither
                                   ordinals (the coded-order lattice)
    frame bytes     --bitgather--> mantissa codes
    codes           --arith------> quantizer values ((q, a, b) dequant
                                   factors, bit-identical to the host
                                   pre-pass and therefore to liba52)

Reference semantics: /root/reference/a52dec-0.7.5-cvs/liba52/parse.c
(parse_exponents:218, coeff_get:336, coeff_get_coupling:435,
dither_gen:310) and bit_allocate.c:124-265 -- all re-expressed as
batched, gather-free tensor programs (the only gathers are the Pallas
windowed bitfield kernels in ops.bitgather and a per-block row gather
for EXP_REUSE).

Everything is shaped [L, S, ...] with L = lanes and S = 6 * nframes
blocks in stream order; cross-block state (exponent reuse, coupling
coordinates, the dither LFSR position) resolves by last-setter gathers
along S plus an explicit carry at chunk boundaries.

Static specialization (RowPlan): the host knows, per dispatched chunk,
how many full-bandwidth channels the format has and whether ANY block
uses coupling, dither or the LFE channel.  prune_raw_meta drops the
meta keys for absent features, and every stage sizes its row set and
slot lattice to the active plan -- a stereo no-coupling chunk runs a
512-slot mantissa lattice instead of 2688 and skips the coupling and
dither stages outright.  Dead rows pass their carry state through
unchanged, exactly like liba52's untouched a52_state_t fields.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from . import alloc as A
from .bitgather import as_u16, extract_fields, extract_fields_shared

# fixed-7 logical row convention (carry + wire meta): fbw0..4, cpl, lfe
EXP_ROW_SLOTS = 86           # abs + 85 groups per row

_BIG_NEG = -(1 << 20)


class RowPlan(NamedTuple):
    """Static per-dispatch row configuration.

    nfch: full-bandwidth channel count (NFCHANS[acmod], static per
    format-homogeneous raw batch); has_cpl/has_lfe/has_dith: whether any
    block in the chunk uses the feature (from meta key presence);
    cpl_fc: the first-coupled channel index when it is chunk-uniform
    (static_cpl_fc), else -1.  cpl_fc >= 0 selects the COMPACT mantissa
    lattice: one coupling segment placed after channel cpl_fc instead of
    a coupling copy interleaved after every channel."""
    nfch: int = 5
    has_cpl: bool = True
    has_lfe: bool = True
    has_dith: bool = True
    cpl_fc: int = -1
    # change-point compaction (static, from static_exp_pts /
    # static_alloc_pts): at most exp_pts blocks per frame carry new
    # exponents, and at most alloc_pts blocks per frame change ANY
    # bit-allocation input.  6 = dense (no compaction).  Steady streams
    # (exponent strategy D15/D25/D45 at block 0 + REUSE) compact 6x: the
    # exponent lattice/gather/decode and the allocator's band math run
    # once per frame instead of once per block, then forward-fill --
    # the device twin of liba52's do_bit_alloc caching (parse.c:949-1056).
    exp_pts: int = 6
    alloc_pts: int = 6
    # mantissa-gather trim (static, from static_emax): per-channel fbw
    # gather extent.  The windowed bitfield gather costs ~1 MXU cycle
    # per SLOT regardless of width, so slots past every stream's endmant
    # (dead by construction: w=0, forward-filled offsets) are pure
    # waste; the gather runs on [0:emax) of each channel (+ 64 LFE
    # slots) and the codes re-expand with zeros.  256 = no trim.  Only
    # consulted by the no-coupling layouts (coupled channels already
    # stop at cplstrtmant; the interleaved/compact cpl layouts keep the
    # full stride).
    emax: int = 256

    @property
    def rows(self):
        """Active rows in fixed-7 logical indexing (fbw0..4=0-4, cpl=5,
        lfe=6)."""
        return (tuple(range(self.nfch))
                + ((5,) if self.has_cpl else ())
                + ((6,) if self.has_lfe else ()))

    @property
    def R(self):
        return len(self.rows)

    @property
    def cpl(self):
        """Active-row index of the coupling row (valid iff has_cpl)."""
        return self.nfch

    @property
    def lfe(self):
        """Active-row index of the LFE row (valid iff has_lfe)."""
        return self.R - 1

    @property
    def s2l(self):
        """Stream position -> active-row index.  Stream order (the order
        exponent fields appear in the bits): cpl, fbw0.., lfe."""
        return (((self.cpl,) if self.has_cpl else ())
                + tuple(range(self.nfch))
                + ((self.lfe,) if self.has_lfe else ()))

    @property
    def l2s(self):
        """Active-row index -> stream position (inverse of s2l)."""
        return tuple(int(i) for i in np.argsort(np.asarray(self.s2l)))

    @property
    def exp_block_slots(self):
        """Exponent slots per block, padded to a 128-multiple so gather
        tiles never straddle a block boundary."""
        return -(-self.R * EXP_ROW_SLOTS // 128) * 128

    @property
    def compact(self):
        """True when the lattice carries ONE coupling segment at a static
        position (after channel cpl_fc) instead of a per-channel copy."""
        return self.has_cpl and self.cpl_fc >= 0

    @property
    def seg(self):
        """Mantissa lattice slots per block: fbw rows (+ one cpl segment
        when compact, or a cpl copy interleaved per channel otherwise)
        + the LFE row."""
        if self.compact:
            main = (self.nfch + 1) * 256
        else:
            main = self.nfch * (512 if self.has_cpl else 256)
        return main + (128 if self.has_lfe else 0)

    @property
    def cpl_seg(self):
        """Slot offset of the coupling segment (compact layout only)."""
        assert self.compact
        return (self.cpl_fc + 1) * 256


def plan_from_meta(meta, nfch: int = 5, cpl_fc: int = -1,
                   exp_pts: int = 6, alloc_pts: int = 6,
                   emax: int = 256) -> RowPlan:
    return RowPlan(nfch=nfch,
                   has_cpl="chincpl" in meta,
                   has_lfe="lfeon" in meta,
                   has_dith="dith" in meta,
                   cpl_fc=cpl_fc if "chincpl" in meta else -1,
                   exp_pts=exp_pts, alloc_pts=alloc_pts,
                   emax=emax if "chincpl" not in meta else 256)


def static_emax(meta) -> int:
    """Host probe: the chunk's max fbw endmant, laddered to {128, 160,
    192, 224, 256} (small ladder = few distinct jit cache keys).  Feeds
    RowPlan.emax for the trimmed mantissa gather."""
    em = int(np.asarray(meta["endmant"]).max(initial=0))
    for cap in (128, 160, 192, 224):
        if em <= cap:
            return cap
    return 256


# meta keys whose change between consecutive blocks invalidates the
# cached bit allocation (the device analogue of parse.c's do_bit_alloc
# triggers); new exponents (exp_off >= 0) always do.
_ALLOC_KEYS = ("endmant", "chincpl", "cplstrt", "cplend", "cplstrtbnd",
               "ncplbnd", "bai", "csnroffst", "cplbai", "babai", "lfebai",
               "cplfleak", "cplsleak", "lfeon", "fscod", "halfrate",
               "deltba")


def static_exp_pts(meta) -> int:
    """Host probe: max blocks per frame carrying new exponents (any row),
    over every lane/frame of the chunk.  [.., S, ..] meta, S = 6F."""
    eo = np.asarray(meta["exp_off"])
    has = (eo >= 0).any(-1)
    has = has.reshape(has.shape[:-1] + (-1, 6))
    return max(1, int(has.sum(-1).max()))


def static_alloc_pts(meta) -> int:
    """Host probe: max blocks per frame where any bit-allocation input
    changes vs the previous block.  Block 0 of EVERY frame counts as a
    potential point: chunks start at frame boundaries and the device
    mask forces a point at each chunk's first block, so the bound must
    hold for any frame-aligned chunking."""
    eo = np.asarray(meta["exp_off"])
    lead = eo.shape[:-2]
    S = eo.shape[-2]
    ch = (eo >= 0).any(-1).reshape(-1, S).copy()
    ch[:, ::6] = True
    for k in _ALLOC_KEYS:
        if k not in meta:
            continue
        v = np.asarray(meta[k]).reshape(np.prod(lead, dtype=int), S, -1)
        ch[:, 1:] |= (v[:, 1:] != v[:, :-1]).any(-1)
    return max(1, int(ch.reshape(-1, S // 6, 6).sum(-1).max()))


def static_cpl_fc(meta) -> int:
    """Host-side probe: the first-coupled channel index if it is the
    same for EVERY coupled block in the chunk, else -1.

    A static fc lets the mantissa lattice place ONE coupling segment
    after channel fc (seg = (nfch+1)*256 + lfe) instead of interleaving
    a 256-slot coupling copy after every channel (seg = nfch*512 + lfe)
    -- a 1.6x smaller lattice for the common all-channels-coupled case."""
    ch = np.asarray(meta.get("chincpl", 0)).ravel()
    ch = ch[ch != 0]
    if ch.size == 0:
        return -1
    fc = np.unique(ch & -ch)
    return int(fc[0]).bit_length() - 1 if fc.size == 1 else -1


def _cummax_blocked(x, block=128):
    """Inclusive cummax along the last axis via two levels: intra-block
    log-shift cummax over the 128-lane dim (shifts stay inside one vreg
    tile, so XLA fuses the 7 steps into ~one pass) + a tiny cummax over
    the G block maxes + one combining max.  jax.lax.cummax over the full
    2688-slot axis instead lowers to ~log2(n) full-size shifted-max HBM
    passes -- measured the dominant cost of the leader fills."""
    if x.shape[-1] % block:
        return jax.lax.cummax(x, axis=x.ndim - 1)
    *lead, seg = x.shape
    G = seg // block
    xb = x.reshape(*lead, G, block)
    intra = jax.lax.cummax(xb, axis=xb.ndim - 1)         # 7 lane shifts
    bmax = intra[..., -1]                                # [*, G]
    carry = jax.lax.cummax(bmax, axis=bmax.ndim - 1)     # tiny
    carry = jnp.concatenate(
        [jnp.full_like(carry[..., :1], _BIG_NEG), carry[..., :-1]],
        axis=-1)
    out = jnp.maximum(intra, carry[..., None])
    return out.reshape(*lead, seg)


def _cumsum(x, axis=-1, exclusive=False, block=128):
    """Exact cumsum of small non-negative ints via blocked triangular
    bf16 MXU matmuls (intra-block) + a tiny inter-block carry.

    XLA lowers cumsum over a 2688-lane axis to ~log2(n) full shifted-add
    HBM passes; this form is ~2 passes.  Exactness contract: |x| values
    exact in bf16 (integers with <= 8 significant bits, e.g. flags,
    field widths <= 16, exponent deltas in [-2, 2]) and running totals
    < 2^24 (exact in the f32 accumulator).  Falls back to jnp.cumsum
    when the axis is not the last or not a multiple of `block`."""
    if axis not in (-1, x.ndim - 1) or x.shape[-1] % block:
        out = jnp.cumsum(x, axis=axis)
        return out - x if exclusive else out
    *lead, seg = x.shape
    G = seg // block
    xb = x.reshape(*lead, G, block).astype(jnp.bfloat16)
    # out[i] = sum_j x[j] * tri[j, i] with j < i (exclusive) / j <= i
    tri = jnp.triu(jnp.ones((block, block), jnp.bfloat16),
                   1 if exclusive else 0)
    intra = jax.lax.dot_general(
        xb, tri, dimension_numbers=(((xb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sums = jnp.sum(xb.astype(jnp.float32), axis=-1)
    base = jnp.cumsum(sums, axis=-1) - sums               # [*, G] exclusive
    out = (intra + base[..., None]).astype(x.dtype)
    return out.reshape(*lead, seg)


# meta keys that only exist to serve one feature; prune_raw_meta drops
# each group when the feature is absent from the whole chunk
_CPL_KEYS = ("cplco_off", "phs_off", "chincpl", "phsflginu", "cplstrt",
             "cplend", "cplbndstrc", "ncplbnd", "cplstrtbnd", "cplbai",
             "cplfleak", "cplsleak")
_LFE_KEYS = ("lfebai", "lfe_scale", "lfeon", "lfe_out")


def prune_raw_meta(meta: dict) -> dict:
    """Drop meta keys for features absent from the whole chunk (delta
    bit allocation, coupling, dither, LFE).  The jit specializes on the
    pytree structure, so each drop selects a cheaper compiled program
    AND removes the corresponding H2D bytes."""
    meta = dict(meta)
    if "deltba" in meta and not np.asarray(meta["deltba"]).any():
        del meta["deltba"]
    if "chincpl" in meta and not np.asarray(meta["chincpl"]).any():
        for k in _CPL_KEYS:
            meta.pop(k, None)
    if "dith" in meta and not np.asarray(meta["dith"]).any():
        del meta["dith"]
    if "lfeon" in meta and not np.asarray(meta["lfeon"]).any():
        for k in _LFE_KEYS:
            meta.pop(k, None)
    return meta


# ---------------------------------------------------------------------------
# meta stacking (host side, numpy)
# ---------------------------------------------------------------------------

_META_KEYS = [
    "exp_off", "expstr", "ngrps", "cplco_off", "phs_off", "man_off",
    "endmant", "chincpl", "phsflginu", "cplstrt", "cplend", "cplbndstrc",
    "ncplbnd", "cplstrtbnd", "bai", "csnroffst", "cplbai", "babai",
    "lfebai", "cplfleak", "cplsleak", "dith", "blksw", "coeff",
    "chanbias", "rematflg", "lfe_scale", "lfeon", "lfe_out", "fscod",
    "halfrate", "deltba",
]


def null_raw_rec() -> dict:
    """A benign per-block record for invalid lane-frames: no exponent or
    coupling fields, csnroffst 0 with all bai clear -> the zero-SNR
    shortcut zeroes every bap, so the device emits silence for the block
    (the lane's valid mask flags it downstream)."""
    return {
        "exp_off": np.full(7, -1, np.int32), "expstr": np.zeros(7, np.int32),
        "ngrps": np.zeros(7, np.int32),
        "cplco_off": np.full(5, -1, np.int32), "phs_off": -1, "man_off": 0,
        "endmant": np.zeros(5, np.int32), "chincpl": 0, "phsflginu": 0,
        "cplstrt": 37, "cplend": 37, "cplbndstrc": 0, "ncplbnd": 0,
        "cplstrtbnd": 0, "bai": 0, "csnroffst": 0, "cplbai": 0,
        "babai": np.zeros(5, np.int32), "lfebai": 0, "cplfleak": 0,
        "cplsleak": 0, "dith": np.zeros(5, np.int32),
        "blksw": np.zeros(5, np.int32), "coeff": np.zeros(5, np.float32),
        "chanbias": 0, "rematflg": 0, "lfe_scale": np.float32(0.0),
        "lfeon": 0, "lfe_out": 0, "fscod": 0, "halfrate": 0,
        "deltba": np.zeros((7, 50), np.int8), "raw_ok": False,
    }


# wire dtypes: the raw-H2D path ships meta over the (slow) host link, so
# every field travels as the narrowest dtype that holds its range.  Bit
# offsets < 8*3840 = 30720 fit int16; band/bin counts fit int16; codes,
# flags and deltba deltas fit int8.  unpack_blocks upcasts once on device.
_META_WIRE_DTYPES = {
    "exp_off": np.int16, "expstr": np.int8, "ngrps": np.int8,
    "cplco_off": np.int16, "phs_off": np.int16, "man_off": np.int16,
    "endmant": np.int16, "chincpl": np.int8, "phsflginu": np.int8,
    "cplstrt": np.int16, "cplend": np.int16, "cplbndstrc": np.int32,
    "ncplbnd": np.int8, "cplstrtbnd": np.int8, "bai": np.int16,
    "csnroffst": np.int8, "cplbai": np.int8, "babai": np.int8,
    "lfebai": np.int8, "cplfleak": np.int8, "cplsleak": np.int8,
    "dith": np.int8, "blksw": np.int8, "chanbias": np.int8,
    "rematflg": np.int8, "lfeon": np.int8, "lfe_out": np.int8,
    "fscod": np.int8, "halfrate": np.int8, "deltba": np.int8,
}


def stack_raw_meta(recs: list) -> dict:
    """Stack A52Parser raw records (one per block) into [S, ...] arrays
    in the narrow wire dtypes (offsets -1 sentinels survive: all wire
    dtypes are signed)."""
    out = {}
    for k in _META_KEYS:
        vals = [r[k] for r in recs]
        dt = _META_WIRE_DTYPES.get(k, np.float32)
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals).astype(dt)
        else:
            out[k] = np.asarray(vals, dt)
    out["raw_ok"] = np.asarray([bool(r["raw_ok"]) for r in recs], bool)
    return out


def widen_meta(meta: dict) -> dict:
    """Device-side upcast of the wire meta to compute dtypes (int32/f32);
    one fused elementwise pass, so all downstream math is unchanged."""
    out = {}
    for k, v in meta.items():
        if v.dtype == jnp.float32 or v.dtype == bool:
            out[k] = v
        else:
            out[k] = v.astype(jnp.int32)
    return out


# ---------------------------------------------------------------------------
# stage 1: exponents
# ---------------------------------------------------------------------------

def _exp_slots(meta, man_off, plan: RowPlan):
    """Build [L, S, R, 86] bit offsets + widths for the exponent fields.

    Inactive slots are filled with a nearby active offset (forward fill,
    leading slots from the block's first field) so every 128-slot tile
    stays inside its 512-byte gather window."""
    s2l = np.asarray(plan.s2l, np.int32)
    rows7 = np.asarray(plan.rows, np.int32)
    exp_off = meta["exp_off"][..., rows7][..., s2l]      # [L, S, R] stream
    ngrps = meta["ngrps"][..., rows7][..., s2l]
    R = plan.R
    active_row = exp_off >= 0
    g = jnp.arange(EXP_ROW_SLOTS, dtype=jnp.int32)       # slot in row
    # slot offsets: abs at +0 (4 bits), group k at +4 + 7k
    offs = exp_off[..., None] + jnp.where(g == 0, 0, 4 + 7 * (g - 1))
    widths = jnp.where(g == 0, 4, 7)
    live = active_row[..., None] & ((g == 0) | (g - 1 < ngrps[..., None]))
    widths = jnp.where(live, widths, 0)

    L, S = exp_off.shape[:2]
    flat_o = offs.reshape(L, S, R * EXP_ROW_SLOTS)
    flat_l = live.reshape(L, S, R * EXP_ROW_SLOTS)
    # forward fill inactive offsets, leading from the first active (or
    # man_off when the block has no exponent fields at all)
    fwd = jax.lax.cummax(jnp.where(flat_l, flat_o, -1), axis=2)
    first = jnp.min(jnp.where(flat_l, flat_o, jnp.int32(1 << 30)), axis=2)
    first = jnp.where(first == (1 << 30), man_off, first)
    filled = jnp.where(fwd < 0, first[..., None], fwd)
    filled = filled.reshape(L, S, R, EXP_ROW_SLOTS)
    widths = widths.reshape(L, S, R, EXP_ROW_SLOTS)
    return filled, widths


def _interleave(deltas, fan: int, lead: int):
    """Place deltas[..., j] at bin lead + fan*j of a [..., 256] array."""
    if fan == 1:
        d = deltas
    else:
        z = jnp.zeros(deltas.shape + (fan - 1,), deltas.dtype)
        d = jnp.concatenate([deltas[..., None], z], axis=-1)
        d = d.reshape(deltas.shape[:-1] + (deltas.shape[-1] * fan,))
    pad = jnp.zeros(deltas.shape[:-1] + (lead,), deltas.dtype)
    d = jnp.concatenate([pad, d], axis=-1)
    if d.shape[-1] < 256:
        tail = jnp.zeros(d.shape[:-1] + (256 - d.shape[-1],), d.dtype)
        d = jnp.concatenate([d, tail], axis=-1)
    return d[..., :256]


def decode_exponents(codes, meta, plan: RowPlan):
    """codes [L, S, R, 86] (stream-row order) -> exp_new [L, S, R, 256]
    int32 in ACTIVE row order (fbw0..nfch-1[, cpl][, lfe]).  Rows without
    new exponents hold garbage -- resolved by the setter gather."""
    s2l = np.asarray(plan.s2l, np.int32)
    rows7 = np.asarray(plan.rows, np.int32)
    R = plan.R
    absexp = codes[..., 0]                               # [L, S, R]
    gc = codes[..., 1:]                                  # [L, S, R, 85]
    d1 = gc // 25 - 2
    d2 = (gc % 25) // 5 - 2
    d3 = gc % 5 - 2
    deltas = jnp.stack([d1, d2, d3], axis=-1).reshape(
        gc.shape[:-1] + (255,))                          # [L, S, R, 255]
    ngrps = meta["ngrps"][..., rows7][..., s2l]
    j = jnp.arange(255, dtype=jnp.int32)
    deltas = jnp.where((j // 3) < ngrps[..., None], deltas, 0)

    expstr = meta["expstr"][..., rows7][..., s2l]        # [L, S, R]
    # fbw/lfe rows: first delta lands at bin 1 (bin 0 = absexp)
    v_fbw = [_interleave(deltas, f, 1) for f in (1, 2, 4)]
    es = expstr[..., None]
    dbins = jnp.where(es == 1, v_fbw[0],
                      jnp.where(es == 2, v_fbw[1], v_fbw[2]))
    if plan.has_cpl:
        # cpl row (stream row 0): first delta lands at bin cplstrt;
        # base = absexp << 1
        v_cpl0 = [_interleave(deltas[..., 0, :], f, 0) for f in (1, 2, 4)]
        es0 = expstr[..., 0, None]
        row_cpl0 = jnp.where(es0 == 1, v_cpl0[0],
                             jnp.where(es0 == 2, v_cpl0[1], v_cpl0[2]))
        # shift the cpl row to its start bin: 16 static shifts selected by
        # cplbegf (gather-free; XLA fuses the where chain)
        cplbegf = (meta["cplstrt"] - 37) // 12           # [L, S]
        shifted = jnp.zeros_like(row_cpl0)
        for a in range(16):
            st = 37 + 12 * a
            sh = jnp.concatenate(
                [jnp.zeros(row_cpl0.shape[:-1] + (st,), row_cpl0.dtype),
                 row_cpl0[..., : 256 - st]], axis=-1)
            shifted = jnp.where((cplbegf == a)[..., None], sh, shifted)
        dbins = dbins.at[..., 0, :].set(shifted)
        base = jnp.where(jnp.arange(R) == 0, absexp << 1, absexp)
    else:
        base = absexp

    exps = base[..., None] + _cumsum(dbins)
    # reorder stream rows -> active rows
    l2s = np.asarray(plan.l2s, np.int32)
    return exps[..., l2s, :]


def resolve_setters(new_vals, set_mask, carry):
    """Last-setter gather along the block axis (EXP_REUSE semantics).

    new_vals [L, S, R, K]: per-block freshly decoded values (garbage
    where not set); set_mask [L, S, R] bool; carry [L, R, K] the value
    entering the chunk.  Returns (resolved [L, S, R, K], new_carry).
    The gather is row-granular (slice size K), not per-element."""
    L, S, R, K = new_vals.shape
    s_idx = jnp.arange(S, dtype=jnp.int32)[None, :, None]
    idx = jax.lax.cummax(jnp.where(set_mask, s_idx, -1), axis=1)
    allv = jnp.concatenate([carry[:, None], new_vals], axis=1)
    out = jnp.take_along_axis(allv, (idx + 1)[..., None], axis=1)
    return out, out[:, -1]


def _frame_points(flag, E):
    """flag [L, S=6F] bool -> (sidx [L, F*E] global block index of the
    e-th flagged block per frame (padding -> 0), valid [L, F*E], cidx
    [L, S] compact index f*E + frame-local rank, valid where flag).

    The static bound E >= max flagged blocks per frame is the caller's
    contract (static_exp_pts / static_alloc_pts)."""
    L, S = flag.shape
    F = S // 6
    hf = flag.reshape(L, F, 6)
    rank = jnp.cumsum(hf.astype(jnp.int32), axis=-1) - hf      # exclusive
    b6 = jnp.arange(6, dtype=jnp.int32)
    pos = []
    valid = []
    for e in range(E):
        sel = hf & (rank == e)                   # <= one block per frame
        pos.append(jnp.sum(jnp.where(sel, b6, 0), axis=-1))
        valid.append(jnp.any(sel, axis=-1))
    pos = jnp.stack(pos, axis=-1)                # [L, F, E]
    valid = jnp.stack(valid, axis=-1)
    base = (jnp.arange(F, dtype=jnp.int32) * 6)[None, :, None]
    sidx = (base + pos).reshape(L, F * E)
    cidx = ((jnp.arange(F, dtype=jnp.int32) * E)[None, :, None]
            + rank).reshape(L, S)
    return sidx, valid.reshape(L, F * E), cidx


def _fill_from_points(vals, pos, valid, init, S):
    """Gather-free state fill from per-frame change points.

    vals [L, F, E, R, K] point values; pos [L, F, E] block position
    (0..5) of each point within its frame; valid [L, F, E, R] per-row
    point validity (broadcast a row axis for block-level validity);
    init [L, R, K] chunk-entry state.  Returns (out [L, 6F, R, K],
    carry [L, R, K]).

    Semantics: block b of frame f sees the latest valid point at
    (f' < f) or (f' == f, pos <= b); before any point, init.  Built
    from where-selects and a log-depth frame scan only -- the
    take_along_axis fill this replaces lowers to a gather measured at
    tens of ms for [L, S, R, 256] shapes."""
    L, F, E, R, K = vals.shape
    # frame-final state per row (last valid point of the frame)
    fv = jnp.zeros((L, F, R, K), vals.dtype)
    fh = jnp.zeros((L, F, R), bool)
    for e in range(E):
        fv = jnp.where(valid[:, :, e, :, None], vals[:, :, e], fv)
        fh = fh | valid[:, :, e]
    # forward-fill across frames, seeded with init before frame 0
    v = jnp.concatenate([init[:, None], fv], axis=1)      # [L, F+1, R, K]
    h = jnp.concatenate([jnp.ones((L, 1, R), bool), fh], axis=1)
    d = 1
    while d <= F:
        vs = jnp.concatenate(
            [jnp.broadcast_to(v[:, :1], (L, d, R, K)), v[:, :-d]], axis=1)
        hs = jnp.concatenate([jnp.zeros((L, d, R), bool), h[:, :-d]],
                             axis=1)
        v = jnp.where(h[..., None], v, vs)
        h = h | hs
        d *= 2
    prev = v[:, :-1]                                      # state BEFORE f
    carry = v[:, -1]
    # within-frame: apply points at pos <= b in ascending order
    outs = []
    for b in range(6):
        ob = prev
        for e in range(E):
            sel = valid[:, :, e] & (pos[:, :, e, None] <= b)
            ob = jnp.where(sel[..., None], vals[:, :, e], ob)
        outs.append(ob)
    out = jnp.stack(outs, axis=2).reshape(L, 6 * F, R, K)
    return out, carry


def _gather_blocks(x, sidx):
    """x [L, S, ...] -> [L, P, ...] rows at sidx [L, P].

    The index keeps SINGLETON trailing dims: XLA lowers that to a
    row-slice gather.  An explicitly broadcast_to'd full-shape index
    instead lowers to an elementwise gather -- measured 26x slower at
    [1024, 16, 6, 256] (733 ms vs 28 ms on v5e)."""
    idx = sidx.reshape(sidx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def unpack_exponents(frames_u8, meta, carry_exp, plan: RowPlan = None):
    """frames_u8 [L, F, MB] uint8 + meta [L, S=6F, ...] -> resolved
    exponents [L, S, R, 256] int32 (active rows) + new carry rows
    [L, R, 256].  With the default all-features plan R = 7 and rows are
    the fixed logical order (fbw0..4, cpl, lfe).

    When plan.exp_pts < 6 the lattice/gather/decode run only on the
    (at most exp_pts per frame) blocks that carry new exponents; all
    other blocks resolve by gathering the last setter's compact row --
    6x less exponent work on steady streams (EXP_REUSE everywhere but
    block 0)."""
    if plan is None:
        plan = plan_from_meta(meta)
    L, F, MB = frames_u8.shape
    S = 6 * F
    R = plan.R
    rows7 = np.asarray(plan.rows, np.int32)
    E = plan.exp_pts
    compact = E < 6
    if compact:
        s_set = meta["exp_off"][..., rows7] >= 0         # [L, S, R]
        has = jnp.any(s_set, axis=-1)                    # [L, S]
        sidx, pvalid, cidx = _frame_points(has, E)
        keys = ("exp_off", "ngrps", "expstr", "man_off", "cplstrt")
        mc = {k: _gather_blocks(meta[k], sidx)
              for k in keys if k in meta}
        # padding points must decode as "no exponent fields": offsets -1
        mc["exp_off"] = jnp.where(pvalid[..., None], mc["exp_off"], -1)
        Sp, blocks_per_frame = F * E, E
    else:
        mc = meta
        Sp, blocks_per_frame = S, 6

    offs, widths = _exp_slots(mc, mc["man_off"], plan)
    offs = offs.reshape(L, Sp, R * EXP_ROW_SLOTS)
    widths = widths.reshape(L, Sp, R * EXP_ROW_SLOTS)
    # Gather step-span contract: a frame row with more than one
    # block/point per frame must pad each block to a FULL 1024-slot mega
    # step, so no step straddles two blocks.  Two exponent points can sit
    # bytes apart bounded only by the frame size (3840 B at max rate --
    # e.g. new exponents at blocks 0 and 5 of a mantissa-heavy frame),
    # far beyond the (MEGA_FR-2)*128-byte window; the single-point case
    # (640 slots, the steady production path) fits one step by itself.
    block_slots = (plan.exp_block_slots if blocks_per_frame == 1
                   else ((plan.exp_block_slots + 1023) // 1024) * 1024)
    pad = block_slots - R * EXP_ROW_SLOTS
    if pad:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[..., -1:], (L, Sp, pad))], axis=-1)
        widths = jnp.concatenate(
            [widths, jnp.zeros((L, Sp, pad), jnp.int32)], axis=-1)
    codes = as_u16(extract_fields(
        frames_u8.reshape(L * F, MB),
        offs.reshape(L * F, blocks_per_frame * block_slots),
        widths.reshape(L * F, blocks_per_frame * block_slots)))
    codes = codes.reshape(L, Sp, block_slots)[..., : R * EXP_ROW_SLOTS]
    codes = codes.reshape(L, Sp, R, EXP_ROW_SLOTS)
    exp_new = decode_exponents(codes, mc, plan)          # [L, Sp, R, 256]

    if not compact:
        set_mask = meta["exp_off"][..., rows7] >= 0      # active rows
        return resolve_setters(exp_new, set_mask, carry_exp[:, rows7])

    # last-setter resolution against the COMPACT point list, gather-free:
    # per-row point validity comes from the gathered exp_off (a padding
    # point has exp_off -1 everywhere), point block positions from sidx
    valid_er = (mc["exp_off"][..., rows7] >= 0).reshape(L, F, E, R)
    pos = (sidx % 6).reshape(L, F, E)
    return _fill_from_points(exp_new.reshape(L, F, E, R, 256), pos,
                             valid_er, carry_exp[:, rows7], S)


def init_unpack_carry(L: int) -> dict:
    return {
        "exp": jnp.zeros((L, 7, 256), jnp.int32),
        "cplco": jnp.zeros((L, 5, 18), jnp.float32),
        "dpos": jnp.zeros((L,), jnp.int32),
    }


# ---------------------------------------------------------------------------
# stage 2: bit allocation (recompute-always, reference-identical inputs)
# ---------------------------------------------------------------------------

def _select8(table, idx):
    """Gather-free small-table lookup: sum of where over table entries."""
    out = jnp.zeros(idx.shape, jnp.int32)
    for k, v in enumerate(np.asarray(table).tolist()):
        out = jnp.where(idx == k, jnp.int32(v), out)
    return out


def _hth_row(fscod, halfrate):
    """[..., 50] hearing threshold row: HTH[b >> halfrate][fscod]."""
    variants = []
    for hr in range(3):
        idx = np.arange(50) >> hr
        for fs in range(3):
            variants.append(np.asarray(T.HTH)[idx, fs].astype(np.int32))
    out = jnp.zeros(fscod.shape + (50,), jnp.int32)
    for hr in range(3):
        for fs in range(3):
            sel = (halfrate == hr) & (fscod == fs)
            out = jnp.where(sel[..., None],
                            jnp.asarray(variants[hr * 3 + fs]), out)
    return out


def allocate_rows(exp, meta, plan: RowPlan = None):
    """exp [L, S, R, 256] (active rows) + meta -> bap [L, S, R, 256] i8.

    Recomputes a52_bit_allocate from the resolved side-info; identical
    inputs to liba52's cached calls give identical outputs.  When
    plan.alloc_pts < 6, the band math runs only at change points (blocks
    where any allocation input differs from the previous block, or new
    exponents landed -- parse.c's do_bit_alloc triggers) and every other
    block forward-fills the last point's bap."""
    if plan is None:
        plan = plan_from_meta(meta)
    if plan.alloc_pts < 6:
        L, S = exp.shape[:2]
        ch = jnp.any(meta["exp_off"][..., np.asarray(plan.rows, np.int32)]
                     >= 0, axis=-1)                      # [L, S]
        one = jnp.ones((L, 1), bool)
        for k in _ALLOC_KEYS:
            if k not in meta:
                continue
            v = meta[k].reshape(L, S, -1)
            d = jnp.any(v[:, 1:] != v[:, :-1], axis=-1)
            ch = ch | jnp.concatenate([one, d], axis=1)
        ch = ch.at[:, 0].set(True)
        Ea = plan.alloc_pts
        F = S // 6
        sidx, pvalid, _ = _frame_points(ch, Ea)
        mc = {k: (_gather_blocks(v, sidx)
                  if (hasattr(v, "ndim") and v.ndim >= 2
                      and v.shape[1] == S) else v)
              for k, v in meta.items()}
        exp_c = _gather_blocks(exp, sidx)
        bap_c = _allocate_dense(exp_c, mc, plan)         # [L, P, R, 256]
        # gather-free fill (chunk block 0 is always a point, so the
        # zero init is never observed)
        R = bap_c.shape[2]
        valid = jnp.broadcast_to(pvalid.reshape(L, F, Ea, 1),
                                 (L, F, Ea, R))
        pos = (sidx % 6).reshape(L, F, Ea)
        bap, _ = _fill_from_points(
            bap_c.reshape(L, F, Ea, R, 256), pos, valid,
            jnp.zeros((L, R, 256), bap_c.dtype), S)
        return bap
    return _allocate_dense(exp, meta, plan)


def _allocate_dense(exp, meta, plan: RowPlan):
    L, S = exp.shape[:2]
    nfch = plan.nfch
    endm = meta["endmant"][..., :nfch]                   # [L, S, nfch]
    zerocol = jnp.zeros((L, S, 1), jnp.int32)
    start = [jnp.zeros((L, S, nfch), jnp.int32)]
    end = [endm]
    rbai = [meta["babai"][..., :nfch]]
    if plan.has_cpl:
        has_cpl = meta["chincpl"] != 0
        start.append(meta["cplstrt"][..., None])
        end.append(jnp.where(has_cpl, meta["cplend"], 0)[..., None])
        rbai.append(meta["cplbai"][..., None])
    if plan.has_lfe:
        lfeon = meta["lfeon"] != 0
        start.append(zerocol)
        end.append(jnp.where(lfeon, 7, 0)[..., None])
        rbai.append(meta["lfebai"][..., None])
    start = jnp.concatenate(start, axis=-1)              # [L, S, R]
    end = jnp.concatenate(end, axis=-1)
    rbai = jnp.concatenate(rbai, axis=-1)

    bai = meta["bai"]
    hr = meta["halfrate"]
    sdecay = _select8(T.SDECAYTAB, (bai >> 9) & 3) >> hr
    fdecay = _select8(T.FDECAYTAB, (bai >> 7) & 3) >> hr
    sgain = _select8(T.SGAINTAB, (bai >> 5) & 3)
    dbknee = _select8(T.DBKNEETAB, (bai >> 3) & 3)
    floor = _select8(T.FLOORTAB, bai & 7)

    snro = (((meta["csnroffst"][..., None] - 15) << 4) + (rbai >> 3)) << 2
    fgain = _select8(T.FGAINTAB, rbai & 7)

    bins = jnp.arange(256, dtype=jnp.int32)
    live = (bins >= start[..., None]) & (bins < end[..., None])
    psd = jnp.where(live, 3072 - (exp << 7), _BIG_NEG)
    bndpsd = A.band_psd(psd, end)                        # [L, S, R, 50]

    hth = _hth_row(meta["fscod"], hr)[..., None, :]      # [L, S, 1, 50]

    def bcast(x):
        return x[..., None]                              # add row axis

    # full-bandwidth + lfe rows
    is_lfe = (jnp.arange(plan.R) == plan.lfe) if plan.has_lfe \
        else jnp.zeros((plan.R,), bool)
    exc_f = A.excitation(bndpsd, fgain,
                         bcast(sgain), bcast(fdecay), bcast(sdecay),
                         is_lfe & True)
    if plan.has_cpl:
        # coupling row (leak-init variant)
        c = plan.cpl
        exc_c = A.excitation(bndpsd[..., c, :], fgain[..., c],
                             sgain, fdecay, sdecay,
                             jnp.zeros(sgain.shape, bool),
                             bndstrt=meta["cplstrtbnd"],
                             cplfleak=meta["cplfleak"],
                             cplsleak=meta["cplsleak"])
        excite = exc_f.at[..., c, :].set(exc_c)
    else:
        excite = exc_f

    deltba = meta.get("deltba")
    if deltba is not None:
        deltba = deltba[..., np.asarray(plan.rows, np.int32), :]
    mask = A.masking_curve(bndpsd, excite, bcast(dbknee)[..., None], hth,
                           deltba=deltba)
    bap = A.bap_from_mask(psd, mask, snro[..., None],
                          bcast(floor)[..., None], start, end)

    # zero-SNR shortcut (parse.c:296-308): all baps zero for the block.
    # endmant is zeroed for channels >= nfchans (parse.py), so endmant > 0
    # is exactly "i < nfchans".
    fbw_live = endm > 0
    zero = (meta["csnroffst"] == 0)
    if plan.has_cpl:
        zero &= ~(has_cpl & ((meta["cplbai"] >> 3) != 0))
    if plan.has_lfe:
        zero &= ~(lfeon & ((meta["lfebai"] >> 3) != 0))
    zero &= jnp.all(~fbw_live
                    | ((meta["babai"][..., :nfch] >> 3) == 0), axis=-1)
    bap = jnp.where(zero[..., None, None], 0, bap)
    return bap


# ---------------------------------------------------------------------------
# stage 3: coupling coordinates + phase flags
# ---------------------------------------------------------------------------

CPLCO_BLOCK_SLOTS = 256      # 5ch x 37 fields + 18 phase bits, padded


def _cplco_slots(meta):
    """[L, S, 256] offsets/widths for the coupling-coordinate fields.

    Per channel: mstrcplco (2 bits) then ncplbnd x (cplcoexp 4 + cplcomant
    4); after all channels, ncplbnd phase-flag bits (acmod 2 only)."""
    off = meta["cplco_off"]                              # [L, S, 5]
    ncpl = meta["ncplbnd"]                               # [L, S]
    L, S = ncpl.shape
    k = jnp.arange(37, dtype=jnp.int32)
    j = (k - 1) // 2
    is_exp = (k % 2) == 1
    foff = jnp.where(k == 0, 0, jnp.where(is_exp, 2 + 8 * j, 6 + 8 * j))
    fw = jnp.where(k == 0, 2, 4)
    offs = off[..., None] + foff                         # [L, S, 5, 37]
    live = (off[..., None] >= 0) & \
        ((k == 0) | (j < ncpl[..., None, None]))
    w = jnp.where(live, fw, 0)

    ph = meta["phs_off"]                                 # [L, S]
    pj = jnp.arange(18, dtype=jnp.int32)
    ph_offs = ph[..., None] + pj
    ph_live = (ph[..., None] >= 0) & (pj < ncpl[..., None])
    ph_w = jnp.where(ph_live, 1, 0)

    offs_all = jnp.concatenate([offs.reshape(L, S, 185), ph_offs], -1)
    w_all = jnp.concatenate([w.reshape(L, S, 185), ph_w], -1)
    live_all = jnp.concatenate([live.reshape(L, S, 185), ph_live], -1)

    fwd = jax.lax.cummax(jnp.where(live_all, offs_all, -1), axis=2)
    first = jnp.min(jnp.where(live_all, offs_all, jnp.int32(1 << 30)),
                    axis=2)
    first = jnp.where(first == (1 << 30), meta["man_off"], first)
    filled = jnp.where(fwd < 0, first[..., None], fwd)
    pad = CPLCO_BLOCK_SLOTS - 203
    filled = jnp.concatenate(
        [filled, jnp.broadcast_to(filled[..., -1:], (L, S, pad))], -1)
    w_all = jnp.concatenate([w_all, jnp.zeros((L, S, pad), jnp.int32)], -1)
    return filled, w_all


def unpack_cplco(frames_u8, meta, carry_cplco):
    """Decode + resolve coupling coordinates (incl. stereo phase flags).

    Returns (cplco [L, S, 5, 18] f32 signed values, new_carry [L, 5, 18]).
    Phase flips compose across blocks: value = fresh[src] * (-1)^(#flips
    since src), with the chunk carry already carrying all past flips."""
    L, F, MB = frames_u8.shape
    S = 6 * F
    offs, widths = _cplco_slots(meta)
    codes = as_u16(extract_fields(
        frames_u8.reshape(L * F, MB),
        offs.reshape(L * F, 6 * CPLCO_BLOCK_SLOTS),
        widths.reshape(L * F, 6 * CPLCO_BLOCK_SLOTS)))
    codes = codes.reshape(L, S, CPLCO_BLOCK_SLOTS)

    c = codes[..., :185].reshape(L, S, 5, 37)
    mstr = 3 * c[..., 0]                                 # [L, S, 5]
    cexp = c[..., 1::2]                                  # [L, S, 5, 18]
    cmant = c[..., 2::2]
    mant = jnp.where(cexp == 15, cmant << 14, (cmant | 16) << 13)
    e = cexp + mstr[..., None] + 15
    fresh = jnp.ldexp(mant.astype(jnp.float32), -e)      # exact 2^-k scale

    set_mask = meta["cplco_off"] >= 0                    # [L, S, 5]
    resolved, _ = resolve_setters(fresh, set_mask, carry_cplco)

    # phase flags flip ch1's coordinates cumulatively (parse.c:647-650)
    ph = codes[..., 185:203]                             # [L, S, 18] bits
    pj = jnp.arange(18, dtype=jnp.int32)
    ph = jnp.where((meta["phs_off"][..., None] >= 0)
                   & (pj < meta["ncplbnd"][..., None]), ph, 0)
    P = jnp.cumsum(ph, axis=1)                           # inclusive
    s_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    idx1 = jax.lax.cummax(
        jnp.where(set_mask[..., 1], s_idx, -1), axis=1)  # [L, S]
    # parity counts flips at blocks src..b INCLUSIVE (the setter block's
    # own flags apply right after its coords decode, parse.c:647-650);
    # src = -1 (carry) counts all flips since chunk start.
    Pext = jnp.concatenate([jnp.zeros((L, 1, 18), P.dtype), P], axis=1)
    Psrc = jnp.take_along_axis(Pext, jnp.maximum(idx1, 0)[..., None],
                               axis=1)
    parity = (P - Psrc) & 1
    flip1 = jnp.where(parity == 1, -1.0, 1.0)
    resolved = resolved.at[..., 1, :].multiply(flip1)
    return resolved, resolved[:, -1]


# ---------------------------------------------------------------------------
# stage 4: mantissa lattice -> dequantized frequency planes
# ---------------------------------------------------------------------------

SEG = 2688                   # full-plan slots: 5 x (fbw 256 + cpl 256) + 128

# quantizer level tables (liba52 tables.h Q(x) values; small, used as
# where-chains -- no gathers)
_LVL3 = (-21845.0, 0.0, 21845.0)
_LVL5 = (-26214.0, -13107.0, 0.0, 13107.0, 26214.0)
_LVL7 = tuple(float(x) for x in np.asarray(T.Q_3))
_LVL11 = (-29789.0, -23831.0, -17873.0, -11916.0, -5958.0, 0.0,
          5958.0, 11916.0, 17873.0, 23831.0, 29789.0)
_LVL15 = tuple(float(x) for x in np.asarray(T.Q_5))


def _chain(idx, levels):
    out = jnp.zeros(idx.shape, jnp.float32)
    for k, v in enumerate(levels):
        if v != 0.0:
            out = jnp.where(idx == k, jnp.float32(v), out)
    return out


@lru_cache(maxsize=1)
def _dither_orbit_u16() -> np.ndarray:
    """LFSR orbit (period 65535) as u16 states, doubled for wrap-free
    windowed gathers.  Draw k starting from state 1 returns orbit[k]
    (dither_gen semantics, parse.c:310-319)."""
    lut = np.asarray(T.dither_lut(), np.uint32)
    vals = np.empty(65535, np.uint16)
    s = 1
    for k in range(65535):
        s = int(lut[s >> 8] ^ ((s << 8) & 0xFFFF))
        vals[k] = s
    return np.concatenate([vals, vals])


@lru_cache(maxsize=1)
def _dither_orbit_bytes() -> np.ndarray:
    """Big-endian byte view of the doubled orbit (per-tile fallback)."""
    return np.frombuffer(_dither_orbit_u16().astype(">u2").tobytes(),
                         np.uint8)


def _first_cpl(chincpl, nfch):
    """Index of the lowest set bit (first coupled channel)."""
    fc = jnp.zeros(chincpl.shape, jnp.int32)
    for i in range(nfch - 1, -1, -1):
        fc = jnp.where((chincpl >> i) & 1, i, fc)
    return fc


def _lattice(fbw, cpl, lfe, plan: RowPlan):
    """fbw [..., nfch, 256] (+ cpl + lfe [..., 128] when live)
    -> [..., seg] slot layout in coded order.

    Interleaved layout (cpl_fc < 0): a 256-slot coupling copy follows
    every channel; cpl may be [..., 256] (broadcast to every copy) or
    [..., nfch, 256] (per-channel, e.g. activity masks).  Compact layout
    (cpl_fc >= 0): ONE coupling segment after channel cpl_fc; cpl must
    be [..., 256]."""
    lead = fbw.shape[:-2]
    nfch = plan.nfch
    if plan.has_cpl and plan.compact:
        k = plan.cpl_fc + 1
        pre = fbw[..., :k, :].reshape(lead + (k * 256,))
        post = fbw[..., k:, :].reshape(lead + ((nfch - k) * 256,))
        main = jnp.concatenate([pre, cpl, post], axis=-1)
    elif plan.has_cpl:
        cplb = cpl if cpl.ndim == fbw.ndim else \
            jnp.broadcast_to(cpl[..., None, :], fbw.shape)
        inter = jnp.stack([fbw, cplb], axis=-2)          # [..., nfch, 2, 256]
        main = inter.reshape(lead + (plan.nfch * 512,))
    else:
        main = fbw.reshape(lead + (plan.nfch * 256,))
    if plan.has_lfe:
        main = jnp.concatenate([main, lfe], axis=-1)
    return main


def _split_lattice(x, plan: RowPlan, fc=None):
    """Inverse of _lattice for per-slot value tensors: returns
    (fbw [..., nfch, 256], cpl [..., 256] | None, lfe [..., 128] | None).
    In the interleaved layout the coupling values live at the copy after
    the DYNAMIC first coupled channel fc [L, S]."""
    nfch = plan.nfch
    L, S = x.shape[:2]
    lfe = x[..., plan.seg - 128:] if plan.has_lfe else None
    if not plan.has_cpl:
        return x[..., :nfch * 256].reshape(L, S, nfch, 256), None, lfe
    if plan.compact:
        cs = plan.cpl_seg
        k = plan.cpl_fc + 1
        pre = x[..., :cs].reshape(L, S, k, 256)
        post = x[..., cs + 256: cs + 256 + (nfch - k) * 256]
        fbw = jnp.concatenate(
            [pre, post.reshape(L, S, nfch - k, 256)], axis=-2)
        return fbw, x[..., cs:cs + 256], lfe
    view = x[..., :nfch * 512].reshape(L, S, nfch, 2, 256)
    chN = jnp.arange(nfch, dtype=jnp.int32)
    cpl = jnp.sum(jnp.where(chN[:, None] == fc[..., None, None],
                            view[..., 1, :], jnp.zeros((), x.dtype)),
                  axis=-2)
    return view[..., 0, :], cpl, lfe


def _cpl_band_index(meta):
    """[L, S, 256] coupling band index per bin (cplbndstrc merge rules)."""
    bins = jnp.arange(256, dtype=jnp.int32)
    sub = (bins - meta["cplstrt"][..., None]) // 12      # [L, S, 256]
    sub = jnp.maximum(sub, 0)
    strc = meta["cplbndstrc"][..., None]
    merged = jnp.zeros(sub.shape, jnp.int32)
    for i in range(17):
        merged += ((strc >> i) & 1) * (i < sub).astype(jnp.int32)
    return sub - merged


def unpack_mantissas(frames_u8, exp, bap, cplco, meta, carry_dpos,
                     plan: RowPlan = None):
    """The coded-order lattice: widths -> offsets -> codes -> (q, a, b).

    exp/bap [L, S, R, 256] in active-row order; cplco [L, S, 5, 18] (or
    None when the plan has no coupling).  Returns (freq [L, S, 6, 256]
    f32, new_dpos [L]).  freq rows are the fixed 5 fbw planes + LFE;
    rows beyond the plan are zero.  freq is bit-identical to the host
    pre-pass's (q*a)*b (parse.c:321-556)."""
    if plan is None:
        plan = plan_from_meta(meta)
    L, F, MB = frames_u8.shape
    S = 6 * F
    nfch = plan.nfch
    seg = plan.seg
    bins = jnp.arange(256, dtype=jnp.int32)
    bap = bap.astype(jnp.int32)

    endm = meta["endmant"][..., :nfch]                   # [L, S, nfch]
    fbw_act = bins < endm[..., None]                     # [L, S, nfch, 256]
    chN = jnp.arange(nfch, dtype=jnp.int32)
    if plan.has_cpl:
        fc = _first_cpl(meta["chincpl"], nfch)
        has_cpl = meta["chincpl"] != 0
        cpl_base = has_cpl[..., None] \
            & (bins >= meta["cplstrt"][..., None]) \
            & (bins < meta["cplend"][..., None])         # [L, S, 256]
        # cpl activity: only the first coupled channel's walk consumes
        # coupling mantissas.  Compact layout: fc is static, ONE segment.
        # Interleaved: per-channel copies masked by chN == fc.
        cpl_act = cpl_base if plan.compact else \
            cpl_base[..., None, :] & (chN[:, None] == fc[..., None, None])
        bap_cpl = bap[..., plan.cpl, :]
        exp_cpl = exp[..., plan.cpl, :]
    else:
        fc = cpl_act = None
        bap_cpl = exp_cpl = None
    if plan.has_lfe:
        lfe_act = (meta["lfeon"][..., None] != 0) & \
            (jnp.arange(128) < 7)                        # [L, S, 128]
        bap_lfe = bap[..., plan.lfe, :128]
        exp_lfe = exp[..., plan.lfe, :128]
    else:
        lfe_act = bap_lfe = exp_lfe = None

    act = _lattice(fbw_act, cpl_act, lfe_act, plan)
    bap_s = _lattice(bap[..., :nfch, :], bap_cpl, bap_lfe, plan)
    b = jnp.where(act, bap_s, 0)

    # --- dither draw lattice (independent of the codes; built early so
    # its ordinal cumsum rides the same stacked pass as the counters) ---
    if plan.has_dith:
        dith = meta["dith"][..., :nfch]                  # [L, S, nfch]
        dith_fbw = (dith != 0)[..., None] & fbw_act & \
            (bap[..., :nfch, :] == 0)                    # [L, S, nfch, 256]
        draws_fbw = dith_fbw.astype(jnp.int32)
        if plan.has_cpl:
            cpl_dmask = jnp.sum(
                jnp.where((dith != 0)
                          & (((meta["chincpl"][..., None] >> chN) & 1) != 0),
                          jnp.int32(1) << chN, 0), axis=-1)  # [L, S]
            ndith = jnp.zeros(cpl_dmask.shape, jnp.int32)
            for i in range(nfch):
                ndith += (cpl_dmask >> i) & 1
            if plan.compact:
                draws_cpl = jnp.where(cpl_act & (bap_cpl == 0),
                                      ndith[..., None], 0)
            else:
                draws_cpl = jnp.where(cpl_act & (bap_cpl[..., None, :] == 0),
                                      ndith[..., None, None], 0)
            draws = _lattice(draws_fbw, draws_cpl,
                             jnp.zeros((L, S, 128), jnp.int32)
                             if plan.has_lfe else None, plan)
        else:
            draws = _lattice(draws_fbw, None,
                             jnp.zeros((L, S, 128), jnp.int32)
                             if plan.has_lfe else None, plan)
    else:
        draws = None

    # --- slot counters: ONE stacked exclusive-cumsum pass ----------------
    # The per-class counters (grouped-quantizer positions), the simple
    # field widths and the dither ordinals are all independent series, so
    # they share a single blocked-triangular pass (VERDICT r3 item 3: the
    # lattice previously made 5 serial _cumsum passes -- 3 counters, then
    # the width cumsum that depended on them, then dither ordinals).  The
    # group-read bit positions follow ARITHMETICALLY from the class
    # counters: a b==1 group read costs 5 bits per 3 members, so bits
    # consumed before a slot with exclusive count c are 5*ceil(c/3) --
    # no dependent second pass (parse.c:354-432's running cursor, as
    # closed-form prefix arithmetic).
    is1 = b == 1
    is2 = b == 2
    is4 = b == 4
    w6 = jnp.where(b == 15, 16, jnp.where(b == 14, 14, b - 1))
    w_simple = (jnp.where(b == 3, 3, 0) + jnp.where(b == 5, 4, 0)
                + jnp.where(b >= 6, w6, 0))
    series = [is1.astype(jnp.int32), is2.astype(jnp.int32),
              is4.astype(jnp.int32), w_simple]
    if draws is not None:
        series.append(draws)
    cs = _cumsum(jnp.stack(series, axis=-2), exclusive=True)
    cnt1, cnt2, cnt4 = cs[..., 0, :], cs[..., 1, :], cs[..., 2, :]
    reads1 = is1 & (cnt1 % 3 == 0)
    reads2 = is2 & (cnt2 % 3 == 0)
    reads4 = is4 & (cnt4 % 2 == 0)
    w = (jnp.where(reads1, 5, 0) + jnp.where(reads2, 7, 0)
         + jnp.where(reads4, 7, 0) + w_simple)
    offsets = (meta["man_off"][..., None]
               + 5 * ((cnt1 + 2) // 3) + 7 * ((cnt2 + 2) // 3)
               + 7 * ((cnt4 + 1) // 2) + cs[..., 3, :])

    trim = (not plan.has_cpl) and (plan.emax < 256 or plan.has_lfe)
    if trim:
        # drop dead gather slots (VERDICT r4 #4: the gather costs ~1 MXU
        # cycle/slot, so slots past the chunk's max endmant -- and LFE
        # slots past 64 (only 7 are ever live) -- are pure waste): run
        # the windowed gather on per-channel [0:emax) prefixes and
        # re-expand the codes with zeros.  Dead slots have w=0 and
        # forward-filled offsets, so dropping them changes no other
        # slot's extraction; offsets stay monotone, and removing
        # zero-advance slots only tightens toward the all-live span
        # bound the mega window already covers (ops/bitgather.py).
        em = plan.emax
        parts = [(c * 256, em) for c in range(nfch)]
        if plan.has_lfe:
            parts.append((nfch * 256, 64))

        def compact_slots(x):
            return jnp.concatenate([x[..., o:o + n] for o, n in parts],
                                   axis=-1)

        segc = sum(n for _, n in parts)
        codes_c = as_u16(extract_fields(
            frames_u8.reshape(L * F, MB),
            compact_slots(offsets).reshape(L * F, 6 * segc),
            compact_slots(w).reshape(L * F, 6 * segc))).reshape(L, S, segc)
        pieces = []
        pos = 0
        for (o, n) in parts:
            pieces.append(codes_c[..., pos:pos + n])
            pad = (256 if o < nfch * 256 else 128) - n
            if pad:
                pieces.append(jnp.zeros((L, S, pad), codes_c.dtype))
            pos += n
        codes = jnp.concatenate(pieces, axis=-1)
    else:
        codes = as_u16(extract_fields(
            frames_u8.reshape(L * F, MB),
            offsets.reshape(L * F, 6 * seg),
            w.reshape(L * F, 6 * seg))).reshape(L, S, seg)

    # grouped-class leader propagation (quantizer_set_t carries,
    # parse.c:43-50): forward-fill the leader's code along the lattice.
    # The three classes stack into ONE cummax call (same total element
    # work, one kernel chain instead of three).
    slot_no = jnp.arange(seg, dtype=jnp.int32)
    pk = jnp.stack(
        [jnp.where(r, (slot_no << 7) | codes, -1)
         for r in (reads1, reads2, reads4)], axis=-2)    # [L, S, 3, seg]
    led = _cummax_blocked(pk) & 127
    c1, c2, c4 = led[..., 0, :], led[..., 1, :], led[..., 2, :]
    m1 = cnt1 % 3
    d1 = jnp.where(m1 == 0, c1 // 9,
                   jnp.where(m1 == 1, (c1 % 9) // 3, c1 % 3))
    m2 = cnt2 % 3
    d2 = jnp.where(m2 == 0, c2 // 25,
                   jnp.where(m2 == 1, (c2 % 25) // 5, c2 % 5))
    m4 = cnt4 % 2
    d4 = jnp.where(m4 == 0, c4 // 11, c4 % 11)

    sv = codes - ((codes >> (jnp.maximum(w6, 1) - 1)) << jnp.maximum(w6, 1))
    v6 = (sv << (16 - jnp.maximum(w6, 1))).astype(jnp.float32)
    qv = jnp.where(is1 & (c1 < 27), _chain(d1, _LVL3),
         jnp.where(is2 & (c2 < 125), _chain(d2, _LVL5),
         jnp.where(b == 3, _chain(codes, _LVL7),
         jnp.where(is4 & (c4 < 121), _chain(d4, _LVL11),
         jnp.where(b == 5, _chain(codes, _LVL15),
                   jnp.where(b >= 6, v6, 0.0))))))
    # out-of-range grouped codes (q1>=27, q2>=125, q4>=121) decode to 0
    # for every member -- the reference tables' literal 0 tails
    # (tables.h:86-115); the arithmetic //,% decomposition above would
    # index past the level ladder, so those slots fall through to 0.

    # --- dither ordinals (LFSR draw positions, parse.c:310-319): the
    # draw lattice was built above; its exclusive ordinals rode the
    # stacked counter pass ---------------------------------------------
    if plan.has_dith:
        ordx = cs[..., 4, :]                             # [L, S, seg]
        tot = jnp.sum(draws, axis=-1)                    # [L, S]
        base = carry_dpos[:, None] + jnp.cumsum(tot, axis=1) - tot
        abs_ord = base[..., None] + ordx                 # [L, S, seg]
        new_dpos = base[:, -1] + tot[:, -1]

        # dither gather lattice: fbw bins (rank 0) then cpl bin-major x rank
        if plan.has_cpl:
            ord_fbw, ord_cpl, _ = _split_lattice(abs_ord, plan, fc)
            rankN = jnp.arange(nfch, dtype=jnp.int32)
            # clamp unused ranks (>= ndith) to the last live draw: keeps
            # the tile span tight for the windowed gather (tiles window
            # off their min offset; the span must stay in the window)
            rmax = jnp.maximum(ndith - 1, 0)[..., None, None]
            d_off = jnp.concatenate(
                [ord_fbw.reshape(L, S, nfch * 256),
                 (ord_cpl[..., None] + jnp.minimum(rankN, rmax)).reshape(
                     L, S, nfch * 256)], axis=-1)
            dseg = 2 * nfch * 256
        else:
            d_off = abs_ord[..., : nfch * 256]
            dseg = nfch * 256
        d_off = d_off.reshape(L * F, 6 * dseg)
        # per-group wrap rebase into the doubled orbit table (group MIN
        # keeps every rebased entry nonnegative under the rank-lattice
        # sawtooth).  The group width must match the gather kernel's
        # window grouping: 1024-slot mega steps (or 128-slot tiles in
        # the per-tile form).
        #
        # Kernel dispatch: the has_cpl layout (all fbw bins, then cpl
        # bin-major) is NOT ordinal-monotone -- fbw channels after the
        # coupling carrier hold ordinals larger than every cpl ordinal,
        # so a 1024-entry mega step straddling the fbw-tail/cpl boundary
        # (dseg = 2*nfch*256 is not a 1024-multiple) can span up to
        # ~2300 entries, past the (MEGA_FR_I16-1)*128 = 1408-entry
        # window.  128-slot tiles never straddle those boundaries (every
        # segment is a 256-entry multiple) and advance <= ~1 entry/slot
        # plus a <= nfch rank sawtooth inside one tile, so the cpl
        # layout dispatches to the per-tile kernel; the monotone no-cpl
        # layout keeps the mega fast path.
        from .bitgather import MEGA, extract_i16_table
        use_mega = MEGA and not plan.has_cpl
        G = 1024 if use_mega else 128
        Sd = d_off.shape[1]
        padn = (-Sd) % G
        if padn:
            d_off = jnp.concatenate(
                [d_off, jnp.broadcast_to(d_off[:, -1:], (L * F, padn))],
                axis=1)
        d_t = d_off.reshape(L * F, -1, G)
        tmin = d_t.min(axis=-1, keepdims=True)
        if use_mega:
            # aligned-16-bit fast path: gather orbit VALUES by entry
            # index (2 exact byte planes, no widths wire, no shift/mask)
            d_t = (tmin % 65535) + (d_t - tmin)
            states = extract_i16_table(
                _dither_orbit_u16(),
                d_t.reshape(L * F, Sd + padn))[:, :Sd].reshape(L, S, dseg)
        else:
            # per-tile windowed gather on the byte-pair table: span per
            # 128-entry tile <= ~(128 + nfch) entries = ~266 B;
            # span_rows=6 gives a (6-2)*128 - 127 - 3 = 382-byte usable
            # window after worst-case start misalignment and read tail
            d_t = ((tmin % 65535) + (d_t - tmin)) * 16
            states = extract_fields_shared(
                jnp.asarray(_dither_orbit_bytes()),
                d_t.reshape(L * F, Sd + padn),
                span_rows=6, per_tile=True)[:, :Sd].reshape(L, S, dseg)
        # the int16 wire value IS the signed LFSR state
        st = states.astype(jnp.int32)
        dval = ((3 * st) >> 2).astype(jnp.float32)
        dv_fbw = dval[..., : nfch * 256].reshape(L, S, nfch, 256)
        if plan.has_cpl:
            dv_cpl = dval[..., nfch * 256:].reshape(L, S, 256, nfch)
    else:
        dith_fbw = jnp.zeros((L, S, nfch, 256), bool)
        dv_fbw = jnp.zeros((L, S, nfch, 256), jnp.float32)
        new_dpos = carry_dpos

    # --- assembly: (q, a, b) per channel/bin -------------------------------
    q_fbw, q_cpl, _ = _split_lattice(qv, plan, fc)
    e_fbw = exp[..., :nfch, :]

    coeff = meta["coeff"][..., :nfch]                    # [L, S, nfch] f32
    b_fbw = bap[..., :nfch, :]
    a_fbw = jnp.ldexp(coeff[..., None], -(e_fbw + 15))
    val_fbw = jnp.where(b_fbw == 0, jnp.where(dith_fbw, dv_fbw, 0.0),
                        q_fbw)
    freq_fbw = jnp.where(fbw_act & ((b_fbw != 0) | dith_fbw),
                         val_fbw * a_fbw, 0.0)

    if plan.has_cpl:
        # coupling: shared mantissa scattered into each coupled channel
        e_cpl = exp_cpl
        bnd = _cpl_band_index(meta)                      # [L, S, 256]
        cprod = cplco[..., :nfch, :] * coeff[..., None]  # MUL_L per ch
        cpl_bin = jnp.zeros((L, S, nfch, 256), jnp.float32)
        for bb in range(18):
            cpl_bin = jnp.where((bnd == bb)[..., None, :],
                                cprod[..., bb:bb + 1], cpl_bin)
        coupled = (((meta["chincpl"][..., None] >> chN) & 1) != 0)
        b_cpl = bap_cpl                                  # [L, S, 256]
        if plan.has_dith:
            dith_c = coupled & (meta["dith"][..., :nfch] != 0)
            rank = jnp.zeros((L, S, nfch), jnp.int32)
            for i in range(nfch):
                rank += jnp.where(chN > i, (cpl_dmask[..., None] >> i) & 1,
                                  0)
            dv_ch = jnp.zeros((L, S, nfch, 256), jnp.float32)
            for r in range(nfch):
                dv_ch = jnp.where((rank == r)[..., None],
                                  dv_cpl[..., r][..., None, :], dv_ch)
            dd = dv_ch * jnp.ldexp(cpl_bin, -(e_cpl[..., None, :] + 15))
        else:
            dith_c = jnp.zeros((L, S, nfch), bool)
            dd = jnp.zeros((L, S, nfch, 256), jnp.float32)
        sf_cpl = jnp.ldexp(jnp.ones((), jnp.float32), -(e_cpl + 15))
        nd = (q_cpl * sf_cpl)[..., None, :] * cpl_bin    # (v*sf)*cplco
        contrib = jnp.where((b_cpl != 0)[..., None, :], nd,
                            jnp.where(dith_c[..., None], dd, 0.0))
        in_cpl = cpl_base[..., None, :] & coupled[..., None]
        freq_fbw = jnp.where(in_cpl, contrib, freq_fbw)

    if nfch < 5:
        freq_fbw = jnp.concatenate(
            [freq_fbw, jnp.zeros((L, S, 5 - nfch, 256), jnp.float32)],
            axis=-2)

    if plan.has_lfe:
        q_lfe = qv[..., seg - 128:]                      # [L, S, 128]
        a_lfe = jnp.ldexp(meta["lfe_scale"][..., None], -(exp_lfe + 15))
        lfe_vals = jnp.where(lfe_act & (bap_lfe != 0)
                             & (meta["lfe_out"][..., None] != 0),
                             q_lfe * a_lfe, 0.0)
        freq_lfe = jnp.concatenate(
            [lfe_vals, jnp.zeros((L, S, 128), jnp.float32)], axis=-1)
    else:
        freq_lfe = jnp.zeros((L, S, 256), jnp.float32)

    freq = jnp.concatenate([freq_fbw, freq_lfe[..., None, :]], axis=-2)
    return freq, new_dpos


def remat_mask(meta):
    """[L, S, 256] stereo rematrix band mask (parse.c:837-865)."""
    k = jnp.arange(256, dtype=jnp.int32)
    region = jnp.where(k < 25, 0,
                       jnp.where(k < 37, 1, jnp.where(k < 61, 2, 3)))
    flg = meta["rematflg"][..., None]
    flag_k = ((flg >> region) & 1) != 0
    end = jnp.minimum(meta["endmant"][..., 0], meta["endmant"][..., 1])
    return flag_k & (k >= 13) & (k < end[..., None])


def unpack_blocks(frames_u8, meta, carry, bias, nfch: int = 5,
                  cpl_fc: int = -1, exp_pts: int = 6, alloc_pts: int = 6,
                  emax: int = 256):
    """Full raw-H2D device unpack: frame bytes + meta -> pipeline blocks.

    frames_u8 [L, F, MB] uint8; meta: stacked raw records [L, S, ...]
    (prune_raw_meta may have dropped absent-feature keys -- the plan
    specializes on what remains); carry: init_unpack_carry dict; bias:
    scalar or [L, S] f32; nfch: static full-bandwidth channel count of
    the (format-homogeneous) batch; cpl_fc: static first-coupled channel
    (from static_cpl_fc(meta) -- the CALLER must have verified every
    coupled block in the chunk has this fc).  Returns (new_carry, blocks)
    with blocks matching the batched decode pipeline contract: freq
    [L, S, 6, 256], blksw, coeff, remat, bias."""
    L, F, MB = frames_u8.shape
    S = 6 * F
    meta = widen_meta(meta)
    plan = plan_from_meta(meta, nfch, cpl_fc, exp_pts, alloc_pts, emax)
    rows7 = np.asarray(plan.rows, np.int32)

    exp, exp_rows = unpack_exponents(frames_u8, meta, carry["exp"], plan)
    # dead rows keep their carry state (liba52 leaves a52_state_t
    # untouched for absent features)
    carry_exp = carry["exp"].at[:, rows7].set(exp_rows)
    bap = allocate_rows(exp, meta, plan)
    if plan.has_cpl:
        cplco, carry_cplco = unpack_cplco(frames_u8, meta, carry["cplco"])
    else:
        cplco, carry_cplco = None, carry["cplco"]
    freq, new_dpos = unpack_mantissas(frames_u8, exp, bap, cplco, meta,
                                      carry["dpos"], plan)
    blocks = {
        "freq": freq,
        "blksw": meta["blksw"] != 0,
        "coeff": meta["coeff"],
        "remat": remat_mask(meta),
        "bias": jnp.broadcast_to(jnp.asarray(bias, jnp.float32), (L, S)),
    }
    new_carry = {"exp": carry_exp, "cplco": carry_cplco, "dpos": new_dpos}
    return new_carry, blocks
