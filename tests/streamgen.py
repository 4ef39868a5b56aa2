"""Synthetic AC-3 stream generator for decoder coverage.

The reference encoder never emits coupling, short blocks, dynamic range,
delta bit allocation, or rematrixing, so differential decode tests built on
it would leave those paths dark.  This generator writes syntactically valid
frames with arbitrary side-info (mirroring the parse order of a52_block)
and random mantissa payloads of the correct widths -- the widths come from
running the same spec-form allocator the decoder uses.
"""
from __future__ import annotations

import numpy as np

import ac3acm_tpu.tables as T
from ac3acm_tpu.host.alloc import bit_allocate, decode_side_params, decode_snroffset
from ac3acm_tpu.host.bitio import BitWriter

REMATRIX_BAND = (25, 37, 61, 253)


class FrameState:
    """Decoder-visible state the generator must track across blocks."""

    def __init__(self, nfchans, lfeon):
        self.nfchans = nfchans
        self.lfeon = lfeon
        self.chincpl = 0
        self.phsflginu = 0
        self.cplstrtmant = 0
        self.cplendmant = 0
        self.cplbndstrc = 0
        self.ncplbnd = 0
        self.cplstrtbnd = 0
        self.endmant = [0] * 5
        self.cpl_exp = np.zeros(256, np.uint8)
        self.fbw_exp = np.zeros((5, 256), np.uint8)
        self.lfe_exp = np.zeros(7, np.uint8)
        self.bai = 0
        self.csnroffst = 40
        self.cplba_bai = 0
        self.ba_bai = [0] * 5
        self.lfeba_bai = 0
        self.cplfleak = 0
        self.cplsleak = 0
        self.deltbae_cpl = T.DELTA_BIT_NONE
        self.deltbae = [T.DELTA_BIT_NONE] * 5
        self.deltba_cpl = np.zeros(50, np.int8)
        self.deltba = np.zeros((5, 50), np.int8)
        # cached bap (decoder recomputes only when do_bit_alloc fires)
        self.cpl_bap = np.zeros(256, np.int8)
        self.fbw_bap = np.zeros((5, 256), np.int8)
        self.lfe_bap = np.zeros(7, np.int8)


def _write_exponents_dec(bw, rng, expstr, ngrps, absexp):
    """Write random valid grouped exponents; returns the decoded array."""
    fan = {1: 1, 2: 2, 3: 4}[expstr]
    out = []
    e = absexp
    for _ in range(ngrps):
        deltas = []
        for _ in range(3):
            lo = max(-2, -e)
            hi = min(2, 24 - e)
            d = int(rng.integers(lo, hi + 1))
            e += d
            deltas.append(d + 2)
            out.extend([e] * fan)
        code = (deltas[0] * 25) + (deltas[1] * 5) + deltas[2]
        bw.write(7, code)
    return np.array(out, np.uint8)


def gen_frame(rng, st: FrameState | None, acmod: int, lfeon: bool,
              fscod: int = 0, frmsizecod: int = 36, halfratecod: int = 0,
              want_cpl=None, want_blksw=None, want_deltba=False,
              want_dynrng=True, zero_snr=False, csnr_cap: int = 34,
              cpl_mask: int | None = None,
              exp_new_blocks: frozenset | None = None,
              force_dith: bool | None = None):
    """Generate one frame; returns (bytes, st).  st carries across frames."""
    nf = int(T.NFCHANS[acmod])
    first = st is None
    if st is None:
        st = FrameState(nf, lfeon)
    # frame start resets delta-bit-allocation existence (parse.c:173-175)
    st.deltbae_cpl = T.DELTA_BIT_NONE
    st.deltbae = [T.DELTA_BIT_NONE] * 5

    bw = BitWriter()
    bw.write(16, 0x0B77)
    bw.write(16, 0)                        # crc1 (not checked by decoder)
    bw.write(2, fscod)
    bw.write(6, frmsizecod)
    bw.write(5, 8 + halfratecod)           # bsid
    bw.write(3, 0)                         # bsmod
    bw.write(3, acmod)
    if (acmod & 1) and acmod != 1:
        bw.write(2, int(rng.integers(0, 4)))   # cmixlev
    if acmod & 4:
        bw.write(2, int(rng.integers(0, 4)))   # surmixlev (2 -> slev==0)
    if acmod == 2:
        bw.write(2, 0)
    bw.write(1, int(lfeon))
    for _ in range(2 if acmod == 0 else 1):
        bw.write(5, 31)                    # dialnorm
        bw.write(1, 0)                     # compre
        bw.write(1, 0)                     # langcode
        bw.write(1, 0)                     # audprodie
    bw.write(2, 0)                         # copyrightb + origbs
    bw.write(1, 0)                         # timecod1e
    bw.write(1, 0)                         # timecod2e
    bw.write(1, 0)                         # addbsie

    for blk in range(6):
        _gen_block(bw, rng, st, acmod, lfeon, fscod, blk, first and blk == 0,
                   want_cpl, want_blksw, want_deltba, want_dynrng, zero_snr,
                   csnr_cap, halfratecod, cpl_mask, exp_new_blocks,
                   force_dith)

    payload = bw.flush()
    total = T.frame_size_bytes(fscod, frmsizecod)
    if len(payload) > total:
        raise OverflowError(f"frame overflow: {len(payload)} > {total}")
    return payload + b"\x00" * (total - len(payload)), st


def _gen_block(bw, rng, st, acmod, lfeon, fscod, blk, very_first,
               want_cpl, want_blksw, want_deltba, want_dynrng, zero_snr,
               csnr_cap=34, halfratecod=0, cpl_mask=None,
               exp_new_blocks=None, force_dith=None):
    nf = st.nfchans
    blksw = [0] * nf
    if want_blksw and acmod != 0:
        blksw = [int(rng.integers(0, 2)) for _ in range(nf)]
    if force_dith is None:
        dithflag = [int(rng.integers(0, 2)) for _ in range(nf)]
    else:
        dithflag = [int(force_dith)] * nf
    for b in blksw:
        bw.write(1, b)
    for d in dithflag:
        bw.write(1, d)
    for _ in range(2 if acmod == 0 else 1):
        if want_dynrng and rng.random() < 0.5:
            bw.write(1, 1)
            bw.write(8, int(rng.integers(0, 256)))
        else:
            bw.write(1, 0)

    # coupling strategy
    can_cpl = acmod >= 2 and want_cpl is not False
    new_cpl = very_first or (can_cpl and rng.random() < 0.3)
    if new_cpl:
        bw.write(1, 1)                     # cplstre
        use = can_cpl and (want_cpl is True
                           or (want_cpl is None and rng.random() < 0.5))
        bw.write(1, int(use))              # cplinu
        st.chincpl = 0
        if use:
            incpl = 0
            while incpl == 0:
                incpl = int(rng.integers(1, 1 << nf))
            if cpl_mask is not None:
                # uniform coupling set across the stream (static-fc
                # compact-lattice tests)
                assert 0 < cpl_mask < (1 << nf)
                incpl = cpl_mask
            for i in range(nf):
                bw.write(1, (incpl >> i) & 1)
            st.chincpl = incpl
            if acmod == 2:
                st.phsflginu = int(rng.integers(0, 2))
                bw.write(1, st.phsflginu)
            cplbegf = int(rng.integers(0, 7))
            cplendf = int(rng.integers(max(cplbegf - 3, 0), 13))
            bw.write(4, cplbegf)
            bw.write(4, cplendf)
            ncplsubnd = cplendf + 3 - cplbegf
            st.ncplbnd = ncplsubnd
            st.cplstrtbnd = int(T.CPL_BNDTAB[cplbegf])
            st.cplstrtmant = cplbegf * 12 + 37
            st.cplendmant = cplendf * 12 + 73
            st.cplbndstrc = 0
            for i in range(ncplsubnd - 1):
                bit = int(rng.integers(0, 2))
                bw.write(1, bit)
                if bit:
                    st.cplbndstrc |= 1 << i
                    st.ncplbnd -= 1
    else:
        bw.write(1, 0)

    if st.chincpl:
        # coupling coordinates are mandatory for every coupled channel when
        # the strategy just changed (otherwise decoders would use stale or
        # uninitialised cplco -- real encoders always send them here)
        cplcoe = 0
        for i in range(nf):
            if (st.chincpl >> i) & 1:
                if new_cpl or very_first or rng.random() < 0.5:
                    cplcoe = 1
                    bw.write(1, 1)
                    bw.write(2, int(rng.integers(0, 3)))   # mstrcplco 0..2
                    for _ in range(st.ncplbnd):
                        bw.write(4, int(rng.integers(0, 16)))  # cplcoexp
                        bw.write(4, int(rng.integers(0, 16)))  # cplcomant
                else:
                    bw.write(1, 0)
        if acmod == 2 and st.phsflginu and cplcoe:
            for _ in range(st.ncplbnd):
                bw.write(1, int(rng.integers(0, 2)))

    if acmod == 2:
        if very_first or rng.random() < 0.4:
            bw.write(1, 1)                 # rematstr
            end = st.cplstrtmant if st.chincpl else 253
            i = 0
            while True:
                bw.write(1, int(rng.integers(0, 2)))
                if REMATRIX_BAND[i] >= end:
                    break
                i += 1
        else:
            bw.write(1, 0)

    # exponent strategies
    cplexpstr = T.EXP_REUSE
    if st.chincpl:
        if exp_new_blocks is not None:
            want_new = new_cpl or blk in exp_new_blocks
        else:
            want_new = new_cpl or rng.random() < 0.4
        cplexpstr = (int(rng.integers(1, 4)) if want_new
                     else T.EXP_REUSE)
        if new_cpl:
            cplexpstr = int(rng.integers(1, 4))
        bw.write(2, cplexpstr)
    chexpstr = []
    for i in range(nf):
        force_new = very_first or new_cpl     # endmant changes need new exps
        if exp_new_blocks is not None:
            want_new = force_new or blk in exp_new_blocks
        else:
            want_new = force_new or rng.random() < 0.4
        s = int(rng.integers(1, 4)) if want_new else T.EXP_REUSE
        chexpstr.append(s)
        bw.write(2, s)
    lfeexpstr = T.EXP_REUSE
    if lfeon:
        if exp_new_blocks is not None:
            lfeexpstr = 1 if (very_first or blk in exp_new_blocks) else 0
        else:
            lfeexpstr = 1 if (very_first or rng.random() < 0.4) else 0
        bw.write(1, lfeexpstr)

    for i in range(nf):
        if chexpstr[i] != T.EXP_REUSE:
            if (st.chincpl >> i) & 1:
                st.endmant[i] = st.cplstrtmant
            else:
                chbwcod = int(rng.integers(0, 61))
                bw.write(6, chbwcod)
                st.endmant[i] = chbwcod * 3 + 73

    if cplexpstr != T.EXP_REUSE:
        ncplgrps = (st.cplendmant - st.cplstrtmant) // (3 << (cplexpstr - 1))
        absexp = int(rng.integers(0, 8)) << 1
        bw.write(4, absexp >> 1)
        exps = _write_exponents_dec(bw, rng, cplexpstr, ncplgrps, absexp)
        st.cpl_exp[st.cplstrtmant:st.cplstrtmant + len(exps)] = exps
    for i in range(nf):
        if chexpstr[i] != T.EXP_REUSE:
            grp = 3 << (chexpstr[i] - 1)
            nchgrps = (st.endmant[i] + grp - 4) // grp
            e0 = int(rng.integers(0, 13))
            bw.write(4, e0)
            st.fbw_exp[i][0] = e0
            exps = _write_exponents_dec(bw, rng, chexpstr[i], nchgrps, e0)
            st.fbw_exp[i][1:1 + len(exps)] = exps
            bw.write(2, 0)                 # gainrng
    if lfeon and lfeexpstr != T.EXP_REUSE:
        e0 = int(rng.integers(0, 13))
        bw.write(4, e0)
        st.lfe_exp[0] = e0
        exps = _write_exponents_dec(bw, rng, 1, 2, e0)
        st.lfe_exp[1:7] = exps[:6]

    # bit allocation info
    st_wrote_bai = st_wrote_snr = st_wrote_leak = st_wrote_deltba = False
    if very_first or rng.random() < 0.3:
        st_wrote_bai = True
        bw.write(1, 1)
        st.bai = int(rng.integers(0, 2048))
        bw.write(11, st.bai)
    else:
        bw.write(1, 0)
    if very_first or (new_cpl and st.chincpl) or rng.random() < 0.3:
        # a fresh coupling strategy needs cpl SNR params written at least
        # once before the coupling allocator runs (uninitialised otherwise)
        st_wrote_snr = True
        bw.write(1, 1)
        st.csnroffst = 0 if zero_snr else int(rng.integers(6, csnr_cap))
        bw.write(6, st.csnroffst)
        if st.chincpl:
            st.cplba_bai = (0 if zero_snr else int(rng.integers(0, 16)) << 3) \
                | int(rng.integers(0, 8))
            bw.write(7, st.cplba_bai)
        for i in range(nf):
            st.ba_bai[i] = (0 if zero_snr else int(rng.integers(0, 16)) << 3) \
                | int(rng.integers(0, 8))
            bw.write(7, st.ba_bai[i])
        if lfeon:
            st.lfeba_bai = (0 if zero_snr else int(rng.integers(0, 16)) << 3) \
                | int(rng.integers(0, 8))
            bw.write(7, st.lfeba_bai)
    else:
        bw.write(1, 0)
    # leak init is mandatory with a fresh coupling strategy: without it
    # decoders would use uninitialised cplfleak/cplsleak state
    if st.chincpl and (new_cpl or rng.random() < 0.3):
        st_wrote_leak = True
        bw.write(1, 1)                     # cplleake
        st.cplfleak = int(rng.integers(0, 8))
        st.cplsleak = int(rng.integers(0, 8))
        bw.write(3, st.cplfleak)
        bw.write(3, st.cplsleak)
    elif st.chincpl:
        bw.write(1, 0)

    if want_deltba and rng.random() < 0.5:
        st_wrote_deltba = True
        bw.write(1, 1)                     # deltbaie
        # REUSE before any NEW would read uninitialised reference memory
        # (liba52 mallocs its state without clearing); always NEW first.
        if st.chincpl:
            st.deltbae_cpl = T.DELTA_BIT_NEW if not st.deltba_cpl.any() \
                else int(rng.integers(0, 2))
            bw.write(2, st.deltbae_cpl)
        for i in range(nf):
            st.deltbae[i] = T.DELTA_BIT_NEW if not st.deltba[i].any() \
                else int(rng.integers(0, 2))
            bw.write(2, st.deltbae[i])
        if st.chincpl and st.deltbae_cpl == T.DELTA_BIT_NEW:
            st.deltba_cpl = _write_deltba(bw, rng)
        for i in range(nf):
            if st.deltbae[i] == T.DELTA_BIT_NEW:
                st.deltba[i] = _write_deltba(bw, rng)
    else:
        bw.write(1, 0)

    if rng.random() < 0.2:
        bw.write(1, 1)                     # skiple
        n = int(rng.integers(0, 12))
        bw.write(9, n)
        for _ in range(n):
            bw.write(8, int(rng.integers(0, 256)))
    else:
        bw.write(1, 0)

    # ---- bit allocation (mirrors the decoder's do_bit_alloc caching) -----
    do_bit_alloc = 0
    if cplexpstr != T.EXP_REUSE:
        do_bit_alloc |= 64
    for i in range(nf):
        if chexpstr[i] != T.EXP_REUSE:
            do_bit_alloc |= 1 << i
    if lfeexpstr != T.EXP_REUSE and lfeon:
        do_bit_alloc |= 32
    if st_wrote_bai:
        do_bit_alloc = 127
    if st_wrote_snr:
        do_bit_alloc = 127
    if st_wrote_leak:
        do_bit_alloc |= 64
    if st_wrote_deltba:
        do_bit_alloc = 127

    if do_bit_alloc:
        params = decode_side_params(st.bai, halfratecod)
        if _zero_snr(st, nf, lfeon):
            st.cpl_bap[:] = 0
            st.fbw_bap[:] = 0
            st.lfe_bap[:] = 0
        else:
            if st.chincpl and (do_bit_alloc & 64):
                st.cpl_bap[:] = bit_allocate(
                    st.cpl_exp, st.cplstrtmant, st.cplendmant,
                    decode_snroffset(st.csnroffst, st.cplba_bai >> 3),
                    int(T.FGAINTAB[st.cplba_bai & 7]), fscod=fscod,
                    halfratecod=halfratecod,
                    cplfleak=st.cplfleak, cplsleak=st.cplsleak,
                    deltba=(st.deltba_cpl
                            if st.deltbae_cpl != T.DELTA_BIT_NONE else None),
                    **params)
            for i in range(nf):
                if do_bit_alloc & (1 << i):
                    st.fbw_bap[i] = bit_allocate(
                        st.fbw_exp[i], 0, st.endmant[i],
                        decode_snroffset(st.csnroffst, st.ba_bai[i] >> 3),
                        int(T.FGAINTAB[st.ba_bai[i] & 7]), fscod=fscod,
                        halfratecod=halfratecod,
                        deltba=(st.deltba[i]
                                if st.deltbae[i] != T.DELTA_BIT_NONE else None),
                        **params)
            if lfeon and (do_bit_alloc & 32):
                exp7 = np.zeros(256, np.uint8)
                exp7[:7] = st.lfe_exp
                st.lfe_bap[:] = bit_allocate(
                    exp7, 0, 7,
                    decode_snroffset(st.csnroffst, st.lfeba_bai >> 3),
                    int(T.FGAINTAB[st.lfeba_bai & 7]), is_lfe=True,
                    fscod=fscod, halfratecod=halfratecod, **params)[:7]
    cpl_bap, fbw_bap, lfe_bap = st.cpl_bap, st.fbw_bap, st.lfe_bap

    q1 = q2 = q4 = 0       # grouped counters (shared incl. coupling + lfe)

    def write_mant(cls):
        nonlocal q1, q2, q4
        if cls == 0:
            return
        if cls == 1:
            if q1 == 0:
                bw.write(5, int(rng.integers(0, 32)))
            q1 = (q1 + 1) % 3
        elif cls == 2:
            if q2 == 0:
                bw.write(7, int(rng.integers(0, 128)))
            q2 = (q2 + 1) % 3
        elif cls == 4:
            if q4 == 0:
                bw.write(7, int(rng.integers(0, 128)))
            q4 = (q4 + 1) % 2
        elif cls == 3:
            bw.write(3, int(rng.integers(0, 8)))
        elif cls == 5:
            bw.write(4, int(rng.integers(0, 16)))
        else:
            nbits = int(T.BAP_BITS[cls])
            bw.write(nbits, int(rng.integers(0, 1 << nbits)))

    done_cpl = False
    for i in range(nf):
        for k in range(st.endmant[i]):
            write_mant(int(fbw_bap[i][k]))
        if (st.chincpl >> i) & 1 and not done_cpl:
            done_cpl = True
            for k in range(st.cplstrtmant, st.cplendmant):
                write_mant(int(cpl_bap[k]))
    if lfeon:
        for k in range(7):
            write_mant(int(lfe_bap[k]))


def _write_deltba(bw, rng):
    dense = np.zeros(50, np.int8)
    deltnseg = int(rng.integers(0, 4))
    bw.write(3, deltnseg)
    j = 0
    for _ in range(deltnseg + 1):
        maxoff = max(0, 45 - j)
        off = int(rng.integers(0, min(31, maxoff) + 1))
        j += off
        maxlen = max(0, 49 - j)
        dl = int(rng.integers(0, min(15, maxlen) + 1))
        code = int(rng.integers(0, 8))
        bw.write(5, off)
        bw.write(4, dl)
        bw.write(3, code)
        delta = code - (3 if code >= 4 else 4)
        if dl:
            dense[j:j + dl] = delta
            j += dl
    return dense


def _zero_snr(st, nf, lfeon):
    if st.csnroffst:
        return False
    if st.chincpl and (st.cplba_bai >> 3):
        return False
    if lfeon and (st.lfeba_bai >> 3):
        return False
    return all(not (st.ba_bai[i] >> 3) for i in range(nf))


def gen_stream(seed: int, acmod: int, lfeon: bool, nframes: int = 4,
               **kw) -> bytes:
    for cap in (34, 20, 12, 8):
        rng = np.random.default_rng(seed)
        st = None
        out = b""
        try:
            for _ in range(nframes):
                frame, st = gen_frame(rng, st, acmod, lfeon, csnr_cap=cap, **kw)
                out += frame
            return out
        except OverflowError:
            continue
    raise OverflowError("stream does not fit even at the lowest SNR cap")
