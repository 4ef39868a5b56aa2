"""Order-exact IMDCT filterbank: bit-identical output for every sample type.

The MXU matmul filterbank (ops/filterbank.py) is the throughput path; its
dot-product summation order differs from the reference's split-radix IFFT,
leaving ~1 ulp discrepancies.  This module replays the reference's exact
evaluation order (imdct.c:77-345: the djbfft-style ifft2/4/8/pass butterfly
sequence, pre/post twiddles, windowed overlap-add) as elementwise ops,
batched over rows -- every add and multiply matches the C code
operation-for-operation.

The whole pipeline is parameterized over an arithmetic variant (the same
axis the reference expresses as SAMPLE/MUL macros, a52_internal.h:124-163):

  * "float"  -- float32; multiplies via an f64 round-trip so XLA cannot
    FMA-contract them (bit-exact vs the float build).
  * "fixed"  -- LIBA52_FIXED int32 Q30: MUL is the reference's split
    16-bit-halves multiply with uint32 wraparound (a52_internal.h:144-150),
    reproduced with int32 two's-complement ops; tables are
    SAMPLE()-truncated to Q30.  Bit-exact vs the -DLIBA52_FIXED build.

Used for the bit-matching decode modes (BASELINE north star) and as the
strongest test oracle; roughly VPU-bound, still thousands of x realtime.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T


def _mul_float(a, b):
    """Correctly-rounded float32 product that XLA cannot FMA-contract.

    XLA's CPU/TPU codegen fuses f32 mul+add into FMA (skipping the product
    rounding the reference performs); computing the product in f64 and
    rounding to f32 is bit-identical to an f32 multiply and the type
    boundary forces the rounding to happen.
    """
    return (a.astype(jnp.float64) * b).astype(jnp.float32)


def _mul_fixed(a, b):
    """FixedOps::MUL (native/ac3sample.inc:33-38): Q30 multiply as split
    16-bit halves with mod-2^32 intermediates.  int32 two's-complement
    wraparound in XLA reproduces the uint32 arithmetic bit-for-bit."""
    lo = (a & 0xFFFF) * (b >> 16) + (a >> 16) * (b & 0xFFFF)
    return (lo >> 14) + (((a >> 16) * (b >> 16)) << 2)


@lru_cache(maxsize=1)
def _tw_float():
    # numpy only: jnp constants must not be cached across traces
    return dict(T.imdct_twiddles())


@lru_cache(maxsize=1)
def _tw_fixed():
    """The same runtime tables SAMPLE()-quantized to int32 Q30 (truncation
    toward zero, matching the C cast in ac3sample.inc:31)."""
    tw = dict(T.imdct_twiddles_f64())
    out = {}
    for k, v in tw.items():
        if k == "fftorder":
            out[k] = v
        else:
            out[k] = np.trunc(np.asarray(v, np.float64)
                              * 1073741824.0).astype(np.int64).astype(np.int32)
    return out


@lru_cache(maxsize=2)
def _build(variant: str):
    """All filterbank entry points for one arithmetic variant."""
    _m = _mul_float if variant == "float" else _mul_fixed
    _tw = _tw_float if variant == "float" else _tw_fixed

    # complex values as (re, im) pairs of [..., n] arrays -------------------

    def _ifft2(re, im):
        r0, r1 = re[..., 0], re[..., 1]
        i0, i1 = im[..., 0], im[..., 1]
        return (jnp.stack([r0 + r1, r0 - r1], -1),
                jnp.stack([i0 + i1, i0 - i1], -1))

    def _ifft4(re, im):
        b = lambda a, k: a[..., k]
        tmp1 = b(re, 0) + b(re, 1)
        tmp2 = b(re, 3) + b(re, 2)
        tmp3 = b(im, 0) + b(im, 1)
        tmp4 = b(im, 2) + b(im, 3)
        tmp5 = b(re, 0) - b(re, 1)
        tmp6 = b(im, 0) - b(im, 1)
        tmp7 = b(im, 2) - b(im, 3)
        tmp8 = b(re, 3) - b(re, 2)
        re = jnp.stack([tmp1 + tmp2, tmp5 + tmp7, tmp1 - tmp2, tmp5 - tmp7],
                       -1)
        im = jnp.stack([tmp3 + tmp4, tmp6 + tmp8, tmp3 - tmp4, tmp6 - tmp8],
                       -1)
        return re, im

    def _bf_zero(a0r, a0i, a1r, a1i, a2r, a2i, a3r, a3i):
        tmp1 = a2r + a3r
        tmp2 = a2i + a3i
        tmp3 = a2i - a3i
        tmp4 = a3r - a2r
        return (a0r + tmp1, a0i + tmp2, a1r + tmp3, a1i + tmp4,
                a0r - tmp1, a0i - tmp2, a1r - tmp3, a1i - tmp4)

    def _bf_half(a0r, a0i, a1r, a1i, a2r, a2i, a3r, a3i, w):
        tmp5 = _m((a2r + a2i), w)
        tmp6 = _m((a2i - a2r), w)
        tmp7 = _m((a3r - a3i), w)
        tmp8 = _m((a3i + a3r), w)
        tmp1 = tmp5 + tmp7
        tmp2 = tmp6 + tmp8
        tmp3 = tmp6 - tmp8
        tmp4 = tmp7 - tmp5
        return (a0r + tmp1, a0i + tmp2, a1r + tmp3, a1i + tmp4,
                a0r - tmp1, a0i - tmp2, a1r - tmp3, a1i - tmp4)

    def _bf(a0r, a0i, a1r, a1i, a2r, a2i, a3r, a3i, wr, wi):
        tmp5 = _m(wi, a2i) + _m(wr, a2r)
        tmp6 = _m(wr, a2i) - _m(wi, a2r)
        tmp8 = _m(wi, a3r) + _m(wr, a3i)
        tmp7 = _m(wr, a3r) - _m(wi, a3i)
        tmp1 = tmp5 + tmp7
        tmp2 = tmp6 + tmp8
        tmp3 = tmp6 - tmp8
        tmp4 = tmp7 - tmp5
        return (a0r + tmp1, a0i + tmp2, a1r + tmp3, a1i + tmp4,
                a0r - tmp1, a0i - tmp2, a1r - tmp3, a1i - tmp4)

    def _ifft8(re, im):
        r0, i0 = _ifft4(re[..., :4], im[..., :4])
        r1, i1 = _ifft2(re[..., 4:6], im[..., 4:6])
        r2, i2 = _ifft2(re[..., 6:8], im[..., 6:8])
        roots16 = _tw()["roots16"]
        a0r, a0i, a1r, a1i, a2r, a2i, a3r, a3i = _bf_zero(
            r0[..., 0], i0[..., 0], r0[..., 2], i0[..., 2],
            r1[..., 0], i1[..., 0], r2[..., 0], i2[..., 0])
        b0r, b0i, b1r, b1i, b2r, b2i, b3r, b3i = _bf_half(
            r0[..., 1], i0[..., 1], r0[..., 3], i0[..., 3],
            r1[..., 1], i1[..., 1], r2[..., 1], i2[..., 1], roots16[1])
        re = jnp.stack([a0r, b0r, a1r, b1r, a2r, b2r, a3r, b3r], -1)
        im = jnp.stack([a0i, b0i, a1i, b1i, a2i, b2i, a3i, b3i], -1)
        return re, im

    def _ifft_pass(re, im, roots, n):
        """ifft_pass(buf, weight, n): 4 sub-buffers of length n at 0, n,
        2n, 3n.  First butterfly (index 0) is the wr=1,wi=0 special case;
        butterflies 1..n-1 use the C pointer walk's root indexing."""
        a0r, a0i = re[..., 0:n], im[..., 0:n]
        a1r, a1i = re[..., n:2 * n], im[..., n:2 * n]
        a2r, a2i = re[..., 2 * n:3 * n], im[..., 2 * n:3 * n]
        a3r, a3i = re[..., 3 * n:4 * n], im[..., 3 * n:4 * n]

        z = _bf_zero(a0r[..., 0], a0i[..., 0], a1r[..., 0], a1i[..., 0],
                     a2r[..., 0], a2i[..., 0], a3r[..., 0], a3i[..., 0])
        wr = roots[: n - 1]
        wi = roots[n - 2::-1]
        v = _bf(a0r[..., 1:], a0i[..., 1:], a1r[..., 1:], a1i[..., 1:],
                a2r[..., 1:], a2i[..., 1:], a3r[..., 1:], a3i[..., 1:],
                wr, wi)

        def cat(z0, vv):
            return jnp.concatenate([z0[..., None], vv], axis=-1)
        re = jnp.concatenate([cat(z[0], v[0]), cat(z[2], v[2]),
                              cat(z[4], v[4]), cat(z[6], v[6])], axis=-1)
        im = jnp.concatenate([cat(z[1], v[1]), cat(z[3], v[3]),
                              cat(z[5], v[5]), cat(z[7], v[7])], axis=-1)
        return re, im

    def _ifft16(re, im):
        r0, i0 = _ifft8(re[..., :8], im[..., :8])
        r1, i1 = _ifft4(re[..., 8:12], im[..., 8:12])
        r2, i2 = _ifft4(re[..., 12:16], im[..., 12:16])
        re = jnp.concatenate([r0, r1, r2], -1)
        im = jnp.concatenate([i0, i1, i2], -1)
        return _ifft_pass(re, im, _tw()["roots16"], 4)

    def _ifft32(re, im):
        r0, i0 = _ifft16(re[..., :16], im[..., :16])
        r1, i1 = _ifft8(re[..., 16:24], im[..., 16:24])
        r2, i2 = _ifft8(re[..., 24:32], im[..., 24:32])
        re = jnp.concatenate([r0, r1, r2], -1)
        im = jnp.concatenate([i0, i1, i2], -1)
        return _ifft_pass(re, im, _tw()["roots32"], 8)

    def _ifft64(re, im):
        r0, i0 = _ifft32(re[..., :32], im[..., :32])
        r1, i1 = _ifft16(re[..., 32:48], im[..., 32:48])
        r2, i2 = _ifft16(re[..., 48:64], im[..., 48:64])
        re = jnp.concatenate([r0, r1, r2], -1)
        im = jnp.concatenate([i0, i1, i2], -1)
        return _ifft_pass(re, im, _tw()["roots64"], 16)

    def _ifft128(re, im):
        r, i = _ifft64(re[..., :64], im[..., :64])
        r1, i1 = _ifft32(re[..., 64:96], im[..., 64:96])
        r2, i2 = _ifft32(re[..., 96:128], im[..., 96:128])
        re = jnp.concatenate([r, r1, r2], -1)
        im = jnp.concatenate([i, i1, i2], -1)
        return _ifft_pass(re, im, _tw()["roots128"], 32)

    def imdct512(data, delay, bias):
        """data [..., 256], delay [..., 128] -> (out [..., 256],
        dnew [..., 128]); exact replay of a52_imdct_512 (imdct.c:258-293)."""
        tw = _tw()
        order = tw["fftorder"]
        dk = data[..., order]
        dm = data[..., 255 - order]
        tr, ti = tw["pre1_r"], tw["pre1_i"]
        bre = _m(ti, dm) + _m(tr, dk)
        bim = _m(tr, dm) - _m(ti, dk)
        bre, bim = _ifft128(bre, bim)

        i = np.arange(64)
        t_r, t_i = tw["post1_r"], tw["post1_i"]
        fr, fi = bre[..., :64], bim[..., :64]
        gr, gi = bre[..., 127 - i], bim[..., 127 - i]
        a_r = _m(t_r, fr) + _m(t_i, fi)
        a_i = _m(t_i, fr) - _m(t_r, fi)
        b_r = _m(t_i, gr) + _m(t_r, gi)
        b_i = _m(t_r, gr) - _m(t_i, gi)

        w = tw["window"]
        d_even = delay[..., 2 * i]
        d_odd = delay[..., 2 * i + 1]
        out = jnp.zeros(data.shape[:-1] + (256,), data.dtype)
        out = out.at[..., 255 - 2 * i].set(
            (_m(d_even, w[2 * i]) + _m(a_r, w[255 - 2 * i])) + bias)
        out = out.at[..., 2 * i].set(
            (_m(d_even, w[255 - 2 * i]) - _m(a_r, w[2 * i])) + bias)
        out = out.at[..., 2 * i + 1].set(
            (_m(d_odd, w[254 - 2 * i]) + _m(b_r, w[2 * i + 1])) + bias)
        out = out.at[..., 254 - 2 * i].set(
            (_m(d_odd, w[2 * i + 1]) - _m(b_r, w[254 - 2 * i])) + bias)
        dnew = jnp.zeros(data.shape[:-1] + (128,), data.dtype)
        dnew = dnew.at[..., 2 * i].set(a_i)
        dnew = dnew.at[..., 2 * i + 1].set(b_i)
        return out, dnew

    def imdct256(data, delay, bias):
        """Exact replay of a52_imdct_256 (imdct.c:295-345)."""
        tw = _tw()
        k = tw["fftorder"][:64]
        tr, ti = tw["pre2_r"], tw["pre2_i"]
        d1a, d1b = data[..., k], data[..., 254 - k]
        d2a, d2b = data[..., k + 1], data[..., 255 - k]
        b1r = _m(ti, d1b) + _m(tr, d1a)
        b1i = _m(tr, d1b) - _m(ti, d1a)
        b2r = _m(ti, d2b) + _m(tr, d2a)
        b2i = _m(tr, d2b) - _m(ti, d2a)
        b1r, b1i = _ifft64(b1r, b1i)
        b2r, b2i = _ifft64(b2r, b2i)

        i = np.arange(32)
        t_r, t_i = tw["post2_r"], tw["post2_i"]
        a_r = _m(t_r, b1r[..., :32]) + _m(t_i, b1i[..., :32])
        a_i = _m(t_i, b1r[..., :32]) - _m(t_r, b1i[..., :32])
        g1r, g1i = b1r[..., 63 - i], b1i[..., 63 - i]
        b_r = _m(t_i, g1r) + _m(t_r, g1i)
        b_i = _m(t_r, g1r) - _m(t_i, g1i)
        c_r = _m(t_r, b2r[..., :32]) + _m(t_i, b2i[..., :32])
        c_i = _m(t_i, b2r[..., :32]) - _m(t_r, b2i[..., :32])
        g2r, g2i = b2r[..., 63 - i], b2i[..., 63 - i]
        d_r = _m(t_i, g2r) + _m(t_r, g2i)
        d_i = _m(t_r, g2r) - _m(t_i, g2i)

        w = tw["window"]
        out = jnp.zeros(data.shape[:-1] + (256,), data.dtype)
        dnew = jnp.zeros(data.shape[:-1] + (128,), data.dtype)
        d0 = delay[..., 2 * i]
        out = out.at[..., 255 - 2 * i].set((_m(d0, w[2 * i])
                                            + _m(a_r, w[255 - 2 * i])) + bias)
        out = out.at[..., 2 * i].set((_m(d0, w[255 - 2 * i])
                                      - _m(a_r, w[2 * i])) + bias)
        dnew = dnew.at[..., 2 * i].set(c_i)
        d1 = delay[..., 127 - 2 * i]
        out = out.at[..., 128 + 2 * i].set((_m(d1, w[127 - 2 * i])
                                            + _m(a_i, w[128 + 2 * i])) + bias)
        out = out.at[..., 127 - 2 * i].set((_m(d1, w[128 + 2 * i])
                                            - _m(a_i, w[127 - 2 * i])) + bias)
        dnew = dnew.at[..., 127 - 2 * i].set(c_r)
        d2 = delay[..., 2 * i + 1]
        out = out.at[..., 254 - 2 * i].set((_m(d2, w[2 * i + 1])
                                            + _m(b_i, w[254 - 2 * i])) + bias)
        out = out.at[..., 2 * i + 1].set((_m(d2, w[254 - 2 * i])
                                          - _m(b_i, w[2 * i + 1])) + bias)
        dnew = dnew.at[..., 2 * i + 1].set(d_r)
        d3 = delay[..., 126 - 2 * i]
        out = out.at[..., 129 + 2 * i].set((_m(d3, w[126 - 2 * i])
                                            + _m(b_r, w[129 + 2 * i])) + bias)
        out = out.at[..., 126 - 2 * i].set((_m(d3, w[129 + 2 * i])
                                            - _m(b_r, w[126 - 2 * i])) + bias)
        dnew = dnew.at[..., 126 - 2 * i].set(d_i)
        return out, dnew

    def filterbank(coeffs, delay, blksw, bias):
        """Drop-in for ops.filterbank.filterbank with bit-exact semantics."""
        out_l, d_l = imdct512(coeffs, delay, bias[..., None])
        out_s, d_s = imdct256(coeffs, delay, bias[..., None])
        blk = blksw[..., None]
        return jnp.where(blk, out_s, out_l), jnp.where(blk, d_s, d_l)

    return {"imdct512": imdct512, "imdct256": imdct256,
            "filterbank": filterbank}


def get_variant(variant: str):
    """{'imdct512', 'imdct256', 'filterbank'} for 'float' or 'fixed'."""
    assert variant in ("float", "fixed")
    return _build(variant)


# float public API (backwards compatible) -----------------------------------

def imdct512_exact(data, delay, bias):
    return _build("float")["imdct512"](data, delay, bias)


def imdct256_exact(data, delay, bias):
    return _build("float")["imdct256"](data, delay, bias)


def filterbank_exact(coeffs, delay, blksw, bias):
    return _build("float")["filterbank"](coeffs, delay, blksw, bias)
