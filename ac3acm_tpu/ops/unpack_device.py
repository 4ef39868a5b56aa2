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
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from . import alloc as A
from .bitgather import extract_fields, extract_fields_shared

# exponent-slot layout: per block, 7 rows x 86 slots (abs + 85 groups),
# padded to 640 so tiles never straddle a block boundary
EXP_ROW_SLOTS = 86
EXP_BLOCK_SLOTS = 640
# rows in STREAM order (the order the fields appear in the bits):
# cpl, fbw0..fbw4, lfe.  Logical order elsewhere: fbw0..4, cpl, lfe.
_STREAM2LOGICAL = np.array([5, 0, 1, 2, 3, 4, 6], np.int32)
_LOGICAL2STREAM = np.argsort(_STREAM2LOGICAL).astype(np.int32)

_BIG_NEG = -(1 << 20)


# ---------------------------------------------------------------------------
# meta stacking (host side, numpy)
# ---------------------------------------------------------------------------

_META_KEYS = [
    "exp_off", "expstr", "ngrps", "cplco_off", "phs_off", "man_off",
    "endmant", "chincpl", "phsflginu", "cplstrt", "cplend", "cplbndstrc",
    "ncplbnd", "cplstrtbnd", "bai", "csnroffst", "cplbai", "babai",
    "lfebai", "cplfleak", "cplsleak", "dith", "rematflg", "lfe_scale",
    "lfeon", "lfe_out", "fscod", "halfrate",
]


def stack_raw_meta(recs: list) -> dict:
    """Stack A52Parser raw records (one per block) into [S, ...] arrays."""
    out = {}
    for k in _META_KEYS:
        vals = [r[k] for r in recs]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals).astype(
                np.float32 if vals[0].dtype.kind == "f" else np.int32)
        elif isinstance(vals[0], (float, np.floating)):
            out[k] = np.asarray(vals, np.float32)
        else:
            out[k] = np.asarray(vals, np.int32)
    out["raw_ok"] = np.asarray([bool(r["raw_ok"]) for r in recs], bool)
    return out


# ---------------------------------------------------------------------------
# stage 1: exponents
# ---------------------------------------------------------------------------

def _exp_slots(meta, man_off):
    """Build [L, S, 7, 86] bit offsets + widths for the exponent fields.

    Inactive slots are filled with a nearby active offset (forward fill,
    leading slots from the block's first field) so every 128-slot tile
    stays inside its 512-byte gather window."""
    exp_off = meta["exp_off"][..., _STREAM2LOGICAL]     # [L, S, 7] stream rows
    ngrps = meta["ngrps"][..., _STREAM2LOGICAL]
    active_row = exp_off >= 0
    g = jnp.arange(EXP_ROW_SLOTS, dtype=jnp.int32)      # slot in row
    # slot offsets: abs at +0 (4 bits), group k at +4 + 7k
    offs = exp_off[..., None] + jnp.where(g == 0, 0, 4 + 7 * (g - 1))
    widths = jnp.where(g == 0, 4, 7)
    live = active_row[..., None] & ((g == 0) | (g - 1 < ngrps[..., None]))
    widths = jnp.where(live, widths, 0)

    L, S = exp_off.shape[:2]
    flat_o = offs.reshape(L, S, 7 * EXP_ROW_SLOTS)
    flat_l = live.reshape(L, S, 7 * EXP_ROW_SLOTS)
    # forward fill inactive offsets, leading from the first active (or
    # man_off when the block has no exponent fields at all)
    fwd = jax.lax.cummax(jnp.where(flat_l, flat_o, -1), axis=2)
    first = jnp.min(jnp.where(flat_l, flat_o, jnp.int32(1 << 30)), axis=2)
    first = jnp.where(first == (1 << 30), man_off, first)
    filled = jnp.where(fwd < 0, first[..., None], fwd)
    filled = filled.reshape(L, S, 7, EXP_ROW_SLOTS)
    widths = widths.reshape(L, S, 7, EXP_ROW_SLOTS)
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


def decode_exponents(codes, meta):
    """codes [L, S, 7, 86] (stream-row order) -> exp_new [L, S, 7, 256]
    int32 in LOGICAL row order (fbw0..4, cpl, lfe).  Rows without new
    exponents hold garbage -- resolved by the setter gather."""
    absexp = codes[..., 0]                               # [L, S, 7]
    gc = codes[..., 1:]                                  # [L, S, 7, 85]
    d1 = gc // 25 - 2
    d2 = (gc % 25) // 5 - 2
    d3 = gc % 5 - 2
    deltas = jnp.stack([d1, d2, d3], axis=-1).reshape(
        gc.shape[:-1] + (255,))                          # [L, S, 7, 255]
    ngrps = meta["ngrps"][..., _STREAM2LOGICAL]
    j = jnp.arange(255, dtype=jnp.int32)
    deltas = jnp.where((j // 3) < ngrps[..., None], deltas, 0)

    expstr = meta["expstr"][..., _STREAM2LOGICAL]        # [L, S, 7]
    # fbw/lfe rows: first delta lands at bin 1 (bin 0 = absexp)
    v_fbw = [_interleave(deltas, f, 1) for f in (1, 2, 4)]
    # cpl row: first delta lands at bin cplstrt; base = absexp << 1
    v_cpl0 = [_interleave(deltas, f, 0) for f in (1, 2, 4)]

    es = expstr[..., None]
    dbins_fbw = jnp.where(es == 1, v_fbw[0],
                          jnp.where(es == 2, v_fbw[1], v_fbw[2]))
    dbins_cpl0 = jnp.where(es == 1, v_cpl0[0],
                           jnp.where(es == 2, v_cpl0[1], v_cpl0[2]))
    # shift the cpl row to its start bin: 16 static shifts selected by
    # cplbegf (gather-free; XLA fuses the where chain)
    cplbegf = (meta["cplstrt"] - 37) // 12               # [L, S]
    row_cpl0 = dbins_cpl0[..., 0, :]                     # stream row 0 = cpl
    shifted = jnp.zeros_like(row_cpl0)
    for a in range(16):
        st = 37 + 12 * a
        sh = jnp.concatenate(
            [jnp.zeros(row_cpl0.shape[:-1] + (st,), row_cpl0.dtype),
             row_cpl0[..., : 256 - st]], axis=-1)
        shifted = jnp.where((cplbegf == a)[..., None], sh, shifted)
    dbins = dbins_fbw.at[..., 0, :].set(shifted)

    base = jnp.where(jnp.arange(7) == 0, absexp << 1, absexp)
    exps = base[..., None] + jnp.cumsum(dbins, axis=-1)
    # reorder stream rows -> logical rows
    return exps[..., _LOGICAL2STREAM, :]


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


def unpack_exponents(frames_u8, meta, carry_exp):
    """frames_u8 [L, F, MB] uint8 + meta [L, S=6F, ...] -> resolved
    exponents [L, S, 7, 256] int32 (logical rows) + new carry."""
    L, F, MB = frames_u8.shape
    S = 6 * F
    offs, widths = _exp_slots(meta, meta["man_off"])     # [L, S, 7, 86]
    offs = offs.reshape(L, S, 7 * EXP_ROW_SLOTS)
    widths = widths.reshape(L, S, 7 * EXP_ROW_SLOTS)
    pad = EXP_BLOCK_SLOTS - 7 * EXP_ROW_SLOTS
    offs = jnp.concatenate(
        [offs, jnp.broadcast_to(offs[..., -1:], (L, S, pad))], axis=-1)
    widths = jnp.concatenate(
        [widths, jnp.zeros((L, S, pad), jnp.int32)], axis=-1)
    codes = extract_fields(
        frames_u8.reshape(L * F, MB),
        offs.reshape(L, F, 6 * EXP_BLOCK_SLOTS).reshape(
            L * F, 6 * EXP_BLOCK_SLOTS),
        widths.reshape(L * F, 6 * EXP_BLOCK_SLOTS))
    codes = codes.reshape(L, S, EXP_BLOCK_SLOTS)[..., : 7 * EXP_ROW_SLOTS]
    codes = codes.reshape(L, S, 7, EXP_ROW_SLOTS)
    exp_new = decode_exponents(codes, meta)              # [L, S, 7, 256]
    set_mask = meta["exp_off"] >= 0                      # logical rows
    return resolve_setters(exp_new, set_mask, carry_exp)


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


def allocate_rows(exp, meta):
    """exp [L, S, 7, 256] (logical rows) + meta -> bap [L, S, 7, 256] i8.

    Recomputes a52_bit_allocate for every (block, row) from the resolved
    side-info; identical inputs to liba52's cached calls give identical
    outputs, so recompute-always needs no do_bit_alloc tracking."""
    L, S = exp.shape[:2]
    nrow = 7
    endm = meta["endmant"]                               # [L, S, 5]
    has_cpl = meta["chincpl"] != 0
    lfeon = meta["lfeon"] != 0
    start = jnp.concatenate([
        jnp.zeros((L, S, 5), jnp.int32),
        meta["cplstrt"][..., None],
        jnp.zeros((L, S, 1), jnp.int32)], axis=-1)
    end = jnp.concatenate([
        endm,
        jnp.where(has_cpl, meta["cplend"], 0)[..., None],
        jnp.where(lfeon, 7, 0)[..., None]], axis=-1)

    bai = meta["bai"]
    hr = meta["halfrate"]
    sdecay = _select8(T.SDECAYTAB, (bai >> 9) & 3) >> hr
    fdecay = _select8(T.FDECAYTAB, (bai >> 7) & 3) >> hr
    sgain = _select8(T.SGAINTAB, (bai >> 5) & 3)
    dbknee = _select8(T.DBKNEETAB, (bai >> 3) & 3)
    floor = _select8(T.FLOORTAB, bai & 7)

    rbai = jnp.concatenate([meta["babai"], meta["cplbai"][..., None],
                            meta["lfebai"][..., None]], axis=-1)  # [L,S,7]
    snro = (((meta["csnroffst"][..., None] - 15) << 4) + (rbai >> 3)) << 2
    fgain = _select8(T.FGAINTAB, rbai & 7)

    bins = jnp.arange(256, dtype=jnp.int32)
    live = (bins >= start[..., None]) & (bins < end[..., None])
    psd = jnp.where(live, 3072 - (exp << 7), _BIG_NEG)
    bndpsd = A.band_psd(psd, end)                        # [L, S, 7, 50]

    hth = _hth_row(meta["fscod"], hr)[..., None, :]      # [L, S, 1, 50]

    def bcast(x):
        return x[..., None]                              # add row axis

    # full-bandwidth + lfe rows
    is_lfe = jnp.arange(nrow) == 6
    exc_f = A.excitation(bndpsd, fgain,
                         bcast(sgain), bcast(fdecay), bcast(sdecay),
                         is_lfe & True)
    # coupling row (leak-init variant)
    exc_c = A.excitation(bndpsd[..., 5, :], fgain[..., 5],
                         sgain, fdecay, sdecay,
                         jnp.zeros(sgain.shape, bool),
                         bndstrt=meta["cplstrtbnd"],
                         cplfleak=meta["cplfleak"],
                         cplsleak=meta["cplsleak"])
    excite = exc_f.at[..., 5, :].set(exc_c)

    mask = A.masking_curve(bndpsd, excite, bcast(dbknee)[..., None], hth)
    bap = A.bap_from_mask(psd, mask, snro[..., None],
                          bcast(floor)[..., None], start, end)

    # zero-SNR shortcut (parse.c:296-308): all baps zero for the block.
    # endmant is zeroed for channels >= nfchans (parse.py), so endmant > 0
    # is exactly "i < nfchans".
    fbw_live = meta["endmant"] > 0
    zero = (meta["csnroffst"] == 0)
    zero &= ~(has_cpl & ((meta["cplbai"] >> 3) != 0))
    zero &= ~(lfeon & ((meta["lfebai"] >> 3) != 0))
    zero &= jnp.all(~fbw_live | ((meta["babai"] >> 3) == 0), axis=-1)
    bap = jnp.where(zero[..., None, None], 0, bap)
    return bap
