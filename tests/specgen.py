"""Independent A/52 stream synthesizer (VERDICT r4 next-round #6).

tests/streamgen.py shares the repo's allocator, tables and BitWriter with
the decoder it validates -- a self-confirmation hazard the reference's
regression corpus (a52dec-0.7.5-cvs/test/tests:1-9, third-party movie
streams) does not have.  This module closes that loop locally with a
SECOND synthesizer that shares ZERO lines with the code under test:

  * its own bit packer (deferred (width, value) list assembled through
    one big integer -- nothing like host/bitio.BitWriter's running
    byte-accumulator),
  * frame syntax transcribed directly from ATSC A/52 sec. 5.4 (field
    order cross-checked against the REFERENCE parser,
    a52dec-0.7.5-cvs/liba52/parse.c:558-940, not against this repo),
  * bit allocation comes from the COMPILED REFERENCE's own
    a52_bit_allocate via the tests/refbuild.py ctypes probe
    (ref_bit_allocate) -- the oracle allocates, so the mantissa field
    widths cannot inherit a repo allocator bug,
  * no imports from ac3acm_tpu at all.

Streams from here and from streamgen.py are both cross-checked through
the compiled reference decoder; goldens produced here exercise coupling
and short blocks with an independent producer.
"""
from __future__ import annotations

import numpy as np

EXP_REUSE = 0
# frame sizes in BYTES for fscod 0 (48 kHz) and 2 (32 kHz): spec Table
# 5.18 collapses to bytes = kbps * 4 (48k) / kbps * 6 (32k); 44.1 kHz
# (parity-coded sizes) is deliberately out of scope here -- streamgen and
# the framing tests cover it.
BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
            320, 384, 448, 512, 576, 640)
NFCH = {1: 1, 2: 2, 3: 3, 4: 3, 5: 4, 6: 4, 7: 5}
# mantissa classes in the REFERENCE allocator's own remapped convention
# (a52dec-0.7.5-cvs/liba52/bit_allocate.c:49-72): negatives are grouped
# quantizers, 3/4 are the odd symmetric ones, >= 5 is the raw bit width
GROUP_BAP = {-1: (5, 27), -2: (7, 125), -3: (7, 121)}   # (bits, max code)
GROUP_N = {-1: 3, -2: 3, -3: 2}
SIMPLE_MAX = {3: (3, 7), 4: (4, 15)}                 # (bits, levels)
CPL_BNDSTART = (31, 35, 37, 39, 41, 42, 43, 44, 45, 45, 46, 46, 47, 47,
                48, 48)                              # spec Table 7.21 lead-in


class Bits:
    """Deferred bit assembly: collect (width, value) pairs, then fold
    them into one arbitrary-precision integer and serialize."""

    def __init__(self):
        self.fields = []

    def put(self, width: int, value: int):
        assert 0 <= value < (1 << width), (width, value)
        self.fields.append((width, value))

    @property
    def nbits(self):
        return sum(w for w, _ in self.fields)

    def pack(self, total_bytes: int) -> bytes:
        n = self.nbits
        assert n <= 8 * total_bytes, (n, total_bytes)
        acc = 0
        for w, v in self.fields:
            acc = (acc << w) | v
        acc <<= 8 * total_bytes - n                  # zero pad
        return acc.to_bytes(total_bytes, "big")


class ChanState:
    """Decoder-visible state the synthesizer tracks to stay consistent."""

    def __init__(self, nfch, lfeon):
        self.nfch = nfch
        self.lfeon = lfeon
        self.chincpl = 0
        self.phsflginu = 0
        self.cplbegf = 0
        self.cplendf = 0
        self.ncplbnd = 0
        self.cplstrtmant = 0
        self.cplendmant = 0
        self.endmant = [0] * 5
        self.exp = np.zeros((5, 256), np.uint8)
        self.cpl_exp = np.zeros(256, np.uint8)
        self.lfe_exp = np.zeros(8, np.uint8)
        self.bai = (2 << 9) | (1 << 7) | (1 << 5) | (2 << 3) | 4
        self.csnroffst = 20
        self.fsnr = [((2 << 3) | 4)] * 5             # fsnroffst|fgaincod
        self.cplfsnr = (2 << 3) | 4
        self.lfefsnr = (2 << 3) | 4
        self.cplfleak = 0
        self.cplsleak = 0


def _write_exps(bits, rng, expstr, ngrps, first):
    """Write one exponent set; returns the decoded per-mantissa deltas
    as a flat exponent list starting from `first`."""
    fan = {1: 1, 2: 2, 3: 4}[expstr]
    out = []
    e = first
    for _ in range(ngrps):
        code = 0
        for _ in range(3):
            d = int(rng.integers(max(-2, -e), min(2, 24 - e) + 1))
            e += d
            code = code * 5 + (d + 2)
            out.extend([e] * fan)
        bits.put(7, code)
    return out


def _alloc(ref, st, exp, start, end, fsnr, bndstart=0, fleak=0, sleak=0,
           fscod=0):
    """bap via the COMPILED REFERENCE's a52_bit_allocate."""
    return ref.bit_allocate(
        np.ascontiguousarray(exp[:256], np.uint8), start, end,
        fscod=fscod, halfrate=0, bai=st.bai, ba_bai=fsnr,
        csnroffst=st.csnroffst, deltbae=2, bndstart=bndstart,
        fastleak=fleak, slowleak=sleak)


def gen_frame(ref, rng, st, acmod, lfeon, fscod=0, kbps=448,
              want_cpl=True, want_blksw=False, first=False,
              csnroffst=None, exp_every=3):
    """One syntactically-valid frame with reference-allocated mantissas.

    ref: tests.refbuild.RefLib (the compiled reference -- its allocator
    decides every mantissa width).  Raises OverflowError when the frame
    does not fit (caller lowers csnroffst and retries)."""
    nf = NFCH[acmod]
    total = kbps * (6 if fscod == 2 else 4)
    frmsizecod = 2 * BITRATES.index(kbps)
    if st is None:
        st = ChanState(nf, lfeon)
        first = True
    if csnroffst is not None:
        st.csnroffst = csnroffst

    bits = Bits()
    bits.put(16, 0x0B77)
    bits.put(16, 0)                                  # crc1 (unchecked)
    bits.put(2, fscod)
    bits.put(6, frmsizecod)
    bits.put(5, 8)                                   # bsid
    bits.put(3, 0)                                   # bsmod
    bits.put(3, acmod)
    if (acmod & 1) and acmod != 1:
        bits.put(2, 1)                               # cmixlev
    if acmod & 4:
        bits.put(2, 1)                               # surmixlev
    if acmod == 2:
        bits.put(2, 0)                               # dsurmod
    bits.put(1, int(lfeon))
    bits.put(5, 31)                                  # dialnorm
    bits.put(1, 0)                                   # compre
    bits.put(1, 0)                                   # langcode
    bits.put(1, 0)                                   # audprodie
    bits.put(1, 0)                                   # copyrightb
    bits.put(1, 0)                                   # origbs
    bits.put(1, 0)                                   # timecod1e
    bits.put(1, 0)                                   # timecod2e
    bits.put(1, 0)                                   # addbsie

    for blk in range(6):
        _block(bits, ref, rng, st, acmod, lfeon, fscod, blk,
               first and blk == 0, want_cpl, want_blksw, exp_every)

    if bits.nbits > 8 * total:
        raise OverflowError(f"{bits.nbits} bits > {8 * total}")
    return bits.pack(total), st


def _block(bits, ref, rng, st, acmod, lfeon, fscod, blk, very_first,
           want_cpl, want_blksw, exp_every):
    nf = st.nfch
    blksw = [int(want_blksw and rng.integers(0, 2)) for _ in range(nf)]
    dith = [int(rng.integers(0, 2)) for _ in range(nf)]
    for v in blksw:
        bits.put(1, v)
    for v in dith:
        bits.put(1, v)
    bits.put(1, 0)                                   # dynrnge

    new_cpl = very_first
    can_cpl = want_cpl and acmod >= 2
    bits.put(1, int(new_cpl))                        # cplstre
    if new_cpl:
        bits.put(1, int(can_cpl))                    # cplinu
        st.chincpl = 0
        if can_cpl:
            incpl = (1 << nf) - 1                    # all channels coupled
            for i in range(nf):
                bits.put(1, (incpl >> i) & 1)
            st.chincpl = incpl
            if acmod == 2:
                st.phsflginu = 1
                bits.put(1, 1)
            st.cplbegf = int(rng.integers(0, 4))
            st.cplendf = int(rng.integers(8, 13))
            bits.put(4, st.cplbegf)
            bits.put(4, st.cplendf)
            nsub = st.cplendf + 3 - st.cplbegf
            st.cplstrtmant = st.cplbegf * 12 + 37
            st.cplendmant = st.cplendf * 12 + 73
            st.ncplbnd = nsub
            for _ in range(nsub - 1):
                bits.put(1, 0)                       # no band merging

    if st.chincpl:
        cplcoe = 0
        for i in range(nf):
            if (st.chincpl >> i) & 1:
                send = new_cpl or rng.random() < 0.4
                bits.put(1, int(send))
                if send:
                    cplcoe = 1
                    bits.put(2, int(rng.integers(0, 3)))
                    for _ in range(st.ncplbnd):
                        bits.put(4, int(rng.integers(0, 15)))
                        bits.put(4, int(rng.integers(0, 16)))
        if acmod == 2 and st.phsflginu and cplcoe:
            for _ in range(st.ncplbnd):
                bits.put(1, int(rng.integers(0, 2)))

    if acmod == 2:
        bits.put(1, int(very_first))                 # rematstr
        if very_first:
            ends = st.cplstrtmant if st.chincpl else 253
            for band_end in (25, 37, 61, 253):
                bits.put(1, int(rng.integers(0, 2)))
                if band_end >= ends:
                    break

    # exponent strategies: new in block 0, then every exp_every blocks
    send_exps = very_first or (blk % exp_every == 0 and blk > 0)
    cplexpstr = int(rng.integers(1, 3)) if (st.chincpl and send_exps) \
        else EXP_REUSE
    chexpstr = [int(rng.integers(1, 4)) if send_exps else EXP_REUSE
                for _ in range(nf)]
    if very_first:
        chexpstr = [int(rng.integers(1, 4)) for _ in range(nf)]
    if st.chincpl:
        bits.put(2, cplexpstr)
    for s in chexpstr:
        bits.put(2, s)
    if lfeon:
        lfeexpstr = 1 if send_exps or very_first else 0
        bits.put(1, lfeexpstr)
    else:
        lfeexpstr = EXP_REUSE

    for i in range(nf):
        if chexpstr[i] != EXP_REUSE:
            if (st.chincpl >> i) & 1:
                st.endmant[i] = st.cplstrtmant
            else:
                chbwcod = int(rng.integers(0, 61))
                bits.put(6, chbwcod)
                st.endmant[i] = chbwcod * 3 + 73

    if cplexpstr != EXP_REUSE:
        ngrps = (st.cplendmant - st.cplstrtmant) // (3 << (cplexpstr - 1))
        absexp = int(rng.integers(0, 8)) << 1
        bits.put(4, absexp >> 1)
        exps = _write_exps(bits, rng, cplexpstr, ngrps, absexp)
        st.cpl_exp[st.cplstrtmant:st.cplstrtmant + len(exps)] = exps
    for i in range(nf):
        if chexpstr[i] != EXP_REUSE:
            grp = 3 << (chexpstr[i] - 1)
            ngrps = (st.endmant[i] + grp - 4) // grp
            e0 = int(rng.integers(0, 13))
            bits.put(4, e0)
            st.exp[i, 0] = e0
            exps = _write_exps(bits, rng, chexpstr[i], ngrps, e0)
            st.exp[i, 1:1 + len(exps)] = exps
            bits.put(2, 0)                           # gainrng
    if lfeexpstr != EXP_REUSE:
        e0 = int(rng.integers(0, 13))
        bits.put(4, e0)
        st.lfe_exp[0] = e0
        exps = _write_exps(bits, rng, 1, 2, e0)
        st.lfe_exp[1:7] = exps[:6]

    bits.put(1, int(very_first))                     # baie
    if very_first:
        bits.put(11, st.bai)
    bits.put(1, int(very_first))                     # snroffste
    if very_first:
        bits.put(6, st.csnroffst)
        if st.chincpl:
            bits.put(7, st.cplfsnr)
        for i in range(nf):
            bits.put(7, st.fsnr[i])
        if lfeon:
            bits.put(7, st.lfefsnr)
    if st.chincpl:
        # always send leak params with a new strategy, like real encoders
        # (liba52's never-sent default diverges from the spec default)
        bits.put(1, int(new_cpl))                    # cplleake
        if new_cpl:
            st.cplfleak = int(rng.integers(0, 8))
            st.cplsleak = int(rng.integers(0, 8))
            bits.put(3, st.cplfleak)
            bits.put(3, st.cplsleak)
    bits.put(1, 0)                                   # deltbaie
    bits.put(1, 0)                                   # skiple

    # --- mantissas: widths decided by the REFERENCE allocator -----------
    bap = np.zeros((5, 256), np.int8)
    for i in range(nf):
        bap[i] = _alloc(ref, st, st.exp[i], 0, st.endmant[i],
                        st.fsnr[i], fscod=fscod)
    cpl_bap = np.zeros(256, np.int8)
    if st.chincpl:
        # liba52-native leak convention: state->cplfleak = 9 - code, the
        # allocator receives cplfleak << 8 (parse.c:754,785)
        cpl_bap = _alloc(ref, st, st.cpl_exp, st.cplstrtmant,
                         st.cplendmant, st.cplfsnr,
                         bndstart=CPL_BNDSTART[st.cplbegf], fscod=fscod,
                         fleak=(9 - st.cplfleak) << 8,
                         sleak=(9 - st.cplsleak) << 8)
    lfe_bap = np.zeros(256, np.int8)
    if lfeon:
        lfe_bap = _alloc(ref, st, st.lfe_exp, 0, 7, st.lfefsnr,
                         fscod=fscod)

    cnt = {-1: 0, -2: 0, -3: 0}                      # group carries

    def mant(b):
        b = int(b)
        if b == 0:
            return
        if b in GROUP_BAP:
            if cnt[b] % GROUP_N[b] == 0:
                w, mx = GROUP_BAP[b]
                bits.put(w, int(rng.integers(0, mx)))
            cnt[b] += 1
        elif b in SIMPLE_MAX:
            w, levels = SIMPLE_MAX[b]
            bits.put(w, int(rng.integers(0, levels)))
        else:
            assert b >= 5, b
            bits.put(b, int(rng.integers(0, 1 << b)))

    done_cpl = False
    for i in range(nf):
        for k in range(st.endmant[i]):
            mant(bap[i, k])
        if (st.chincpl >> i) & 1 and not done_cpl:
            done_cpl = True
            for k in range(st.cplstrtmant, st.cplendmant):
                mant(cpl_bap[k])
    if lfeon:
        for k in range(7):
            mant(lfe_bap[k])


def gen_stream(ref, seed, acmod, lfeon, nframes=4, **kw):
    """Retry ladder over csnroffst until the frame payload fits."""
    for cap in (20, 14, 10, 6, 3):
        rng = np.random.default_rng(seed)
        st, out = None, b""
        try:
            for fi in range(nframes):
                frame, st = gen_frame(ref, rng, st, acmod, lfeon,
                                      first=(fi == 0), csnroffst=cap, **kw)
                out += frame
            return out
        except OverflowError:
            continue
    raise OverflowError("no csnroffst cap fits")
