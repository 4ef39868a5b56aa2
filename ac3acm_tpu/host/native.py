"""ctypes bindings for the native host pre-pass (native/ac3host.cpp).

Builds the shared library on demand (g++ -O3), installs the generated
tables from ac3acm_tpu.tables (single source of truth), and exposes a
NativeParser with the same decode_frame contract as the pure-Python
A52Parser -- they are cross-checked in tests and interchangeable.  ctypes
releases the GIL during calls, so N streams parse on N threads.
"""
from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading

import numpy as np

from .. import tables as T

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(_HERE, "..", "..", "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_lock = threading.Lock()
_lib = None

# block-float scale groups per premixed plane (32 bins each); must match
# native/ac3host.cpp PRE_GROUPS
PRE_GROUPS = 16

# a52_dynrng user-callback signature: float fn(float range, void* data)
DYNRNG_CB = C.CFUNCTYPE(C.c_float, C.c_float, C.c_void_p)


class FrameOut(C.Structure):
    _fields_ = [
        ("q", C.c_float * 256 * 6 * 6),
        ("a", C.c_float * 256 * 6 * 6),
        ("b", C.c_float * 256 * 6 * 6),
        ("blksw", C.c_uint8 * 5 * 6),
        ("coeff", C.c_float * 5 * 6),
        ("remat", C.c_uint8 * 256 * 6),
        ("chanbias", C.c_int32),
        ("acmod", C.c_int32),
        ("lfeon", C.c_int32),
        ("output", C.c_int32),
        ("nfchans", C.c_int32),
        ("slev", C.c_float),
        ("bias", C.c_float),
    ]


def _src_digest() -> str:
    import hashlib
    h = hashlib.sha256()
    for name in ("ac3host.cpp", "ac3sample.inc", "ac3fb.inc"):
        with open(os.path.join(_NATIVE_DIR, name), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build() -> str:
    """Compile the native host library on demand.

    The rebuild is keyed on a content hash of the sources (stored next to
    the artifact), not on mtimes -- a fresh clone gets equal mtimes and a
    stale or wrong-arch binary must never be loaded silently.
    """
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "ac3host.cpp")
    so = os.path.join(_BUILD_DIR, "libac3host.so")
    stamp = so + ".sha256"
    digest = _src_digest()
    have = None
    if os.path.exists(so) and os.path.exists(stamp):
        with open(stamp) as f:
            have = f.read().strip()
    if have != digest:
        subprocess.run(
            ["g++", "-O3", "-ffp-contract=off", "-fPIC", "-shared",
             "-std=c++17", "-pthread", src, "-o", so],
            check=True, capture_output=True, text=True)
        with open(stamp, "w") as f:
            f.write(digest)
    return so


def _i32(x):
    return np.ascontiguousarray(x, dtype=np.int32)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = C.CDLL(_build())
        lib.ac3h_new.restype = C.c_void_p
        lib.ac3h_free.argtypes = [C.c_void_p]
        lib.ac3h_set_drc.argtypes = [C.c_void_p, C.c_int]
        lib.ac3h_syncinfo.restype = C.c_int
        lib.ac3h_frame.restype = C.c_int
        lib.ac3h_frame.argtypes = [C.c_void_p, C.c_char_p, C.c_int,
                                   C.c_float, C.c_float, C.POINTER(FrameOut)]
        lib.ac3h_frames.restype = C.c_int
        lib.ac3h_frames.argtypes = [C.c_void_p, C.c_char_p, C.c_int64,
                                    C.c_int, C.c_int, C.c_float, C.c_float,
                                    C.POINTER(FrameOut),
                                    C.POINTER(C.c_int32)]

        f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)
        hth = _i32(T.HTH)                       # [50][3]
        latab = _i32(np.concatenate([T.LATAB, np.zeros(0, np.int32)]))
        args = [
            latab, hth, np.ascontiguousarray(T.BAPTAB, np.int8),
            _i32(T.BNDTAB), _i32(T.BNDSZ), _i32(T.MASKTAB),
            f32(T.SCALE_FACTOR), f32(T.Q_1_0), f32(T.Q_1_1), f32(T.Q_1_2),
            f32(T.Q_2_0), f32(T.Q_2_1), f32(T.Q_2_2), f32(T.Q_3),
            f32(T.Q_4_0), f32(T.Q_4_1), f32(T.Q_5),
            np.ascontiguousarray(T.dither_lut(), np.uint16),
            _i32(T.SDECAYTAB), _i32(T.FDECAYTAB), _i32(T.SGAINTAB),
            _i32(T.DBKNEETAB), _i32(T.FLOORTAB), _i32(T.FGAINTAB),
            np.ascontiguousarray(T.EXP_1, np.int8),
            np.ascontiguousarray(T.EXP_2, np.int8),
            np.ascontiguousarray(T.EXP_3, np.int8),
            _i32(T.CPL_BNDTAB), _i32(T.BAP_BITS),
        ]
        lib._table_refs = args                  # keep alive
        lib.ac3h_init(*[a.ctypes.data_as(C.c_void_p) for a in args])
        _lib = lib
        return lib


class NativeParser:
    """Per-stream native parser (mirrors host.parse.A52Parser outputs)."""

    def __init__(self):
        self.lib = get_lib()
        self._p = self.lib.ac3h_new()

    def __del__(self):
        if getattr(self, "_p", None):
            self.lib.ac3h_free(self._p)
            self._p = None

    def set_drc_enabled(self, enabled: bool):
        self.lib.ac3h_set_drc(self._p, int(enabled))

    def decode_frames_raw(self, buf: bytes, nframes: int, flags: int,
                          level: float = 1.0, bias: float = 0.0):
        """Parse up to nframes from buf.  Returns (n, FrameOut array)."""
        outs = (FrameOut * nframes)()
        sizes = (C.c_int32 * nframes)()
        n = self.lib.ac3h_frames(self._p, buf, len(buf), nframes, flags,
                                 level, bias, outs, sizes)
        return n, outs

    def decode_frames(self, buf: bytes, nframes: int, flags: int,
                      level: float = 1.0, bias: float = 0.0):
        """Parse and return device-ready stacked block tensors.

        Returns (blocks dict with [nblk, ...] arrays, meta dict) or None.
        """
        n, outs = self.decode_frames_raw(buf, nframes, flags, level, bias)
        if n == 0:
            return None
        view = np.ctypeslib.as_array(outs)[:n]      # structured array view
        # dequant on the host: (q*a)*b in f32 is the same IEEE multiply the
        # device would do, and shipping one tensor instead of three cuts the
        # host->device volume (and the pipeline's HBM input reads) 3x
        q = view["q"].reshape(n * 6, 6, 256)
        a = view["a"].reshape(n * 6, 6, 256)
        b = view["b"].reshape(n * 6, 6, 256)
        blocks = {
            "freq": (q * a) * b,
            "blksw": view["blksw"].reshape(n * 6, 5).astype(bool),
            "coeff": view["coeff"].reshape(n * 6, 5).copy(),
            "remat": view["remat"].reshape(n * 6, 256).astype(bool),
            "bias": np.repeat(view["bias"], 6).astype(np.float32),
        }
        meta = {
            "acmod": int(view["acmod"][-1]),
            "lfeon": int(view["lfeon"][-1]),
            "output": int(view["output"][-1]),
            "nfchans": int(view["nfchans"][-1]),
            "slev": float(view["slev"][-1]),
            "chanbias": int(view["chanbias"][-1]),
        }
        return blocks, meta


class NativeDecoder:
    """Full native CPU decode path: parse + bit-exact filterbank + downmix.

    Matches the reference decoder float-for-float (compiled with
    -ffp-contract=off so every f32 product rounds identically).  This is
    the framework's bit-matching mode and CPU fallback; the TPU pipeline
    is the throughput path.
    """

    def __init__(self):
        self.lib = get_lib()
        L = self.lib
        if not hasattr(L, "_dec_ready"):
            L.ac3h_dec_new.restype = C.c_void_p
            L.ac3h_dec_free.argtypes = [C.c_void_p]
            L.ac3h_dec_set_drc.argtypes = [C.c_void_p, C.c_int]
            L.ac3h_dec_set_dynrng_call.argtypes = [C.c_void_p, DYNRNG_CB,
                                                   C.c_void_p]
            L.ac3h_dec_frame.restype = C.c_int
            L.ac3h_dec_frame.argtypes = [C.c_void_p, C.c_char_p, C.c_int,
                                         C.c_float, C.c_float,
                                         C.POINTER(C.c_float),
                                         C.POINTER(C.c_int32)]
            L._dec_ready = True
        self._d = L.ac3h_dec_new()

    def __del__(self):
        if getattr(self, "_d", None):
            self.lib.ac3h_dec_free(self._d)
            self._d = None

    def set_drc_enabled(self, enabled: bool):
        self.lib.ac3h_dec_set_drc(self._d, int(enabled))

    def set_dynrng_call(self, fn):
        """a52_dynrng callback parity (liba52 parse.c:207-216): fn(range)
        -> new range, applied before the level scale.  Pass None to clear."""
        if fn is None:
            self._dyncb = DYNRNG_CB()          # NULL fn pointer
        else:
            self._dyncb = DYNRNG_CB(lambda r, _data: float(fn(r)))
        self.lib.ac3h_dec_set_dynrng_call(self._d, self._dyncb, None)

    def decode_stream(self, es: bytes, flags: int, level: float = 1.0,
                      bias: float = 0.0):
        """Returns float32 [nblk, nch_out, 256] planar PCM."""
        from .parse import syncinfo
        out_blocks = []
        pcm = np.zeros((6, 6, 256), np.float32)
        nch = C.c_int32(0)
        pos = 0
        while pos + 7 <= len(es):
            size, _, _, _ = syncinfo(es[pos:pos + 7])
            if size == 0:
                pos += 1
                continue
            if pos + size > len(es):
                break
            r = self.lib.ac3h_dec_frame(
                self._d, es[pos:pos + size], flags, level, bias,
                pcm.ctypes.data_as(C.POINTER(C.c_float)), C.byref(nch))
            if r == 0:
                n = int(nch.value)
                out_blocks.append(
                    pcm.reshape(-1)[: 6 * n * 256].reshape(6, n, 256).copy())
            pos += size
        if not out_blocks:
            return np.zeros((0, 0, 256), np.float32)
        return np.concatenate(out_blocks, axis=0)


class SampleDecoder:
    """LIBA52_FIXED / LIBA52_DOUBLE sample-type decode backends.

    The reference compiles to three sample types (include/a52.h:27-36);
    NativeDecoder is the float build, this wraps the int32-Q30 fixed and
    double builds (templated over the same arithmetic traits the reference
    expresses as macros, a52_internal.h:124-163).

    >>> d = SampleDecoder("fixed")
    >>> pcm = d.decode_stream(es, T.A52_STEREO)    # int32 Q30 planar
    """

    _KINDS = {"fixed": (0, np.int32), "double": (1, np.float64)}

    def __init__(self, kind: str, backend: str = "native"):
        if kind not in self._KINDS:
            raise ValueError(f"kind must be fixed|double, got {kind!r}")
        if backend not in ("native", "tpu"):
            raise ValueError(f"backend must be native|tpu, got {backend!r}")
        if backend == "tpu" and kind != "fixed":
            # double needs f64 arithmetic, which TPUs do not implement;
            # the reference's double build stays a CPU backend
            raise ValueError("backend='tpu' supports kind='fixed' only")
        self.kind = kind
        self.backend = backend
        self._k, self._np = self._KINDS[kind]
        self.lib = get_lib()
        L = self.lib
        if not hasattr(L, "_sdec_ready"):
            L.ac3h_sdec_new.restype = C.c_void_p
            L.ac3h_sdec_new.argtypes = [C.c_int]
            L.ac3h_sdec_free.argtypes = [C.c_void_p, C.c_int]
            L.ac3h_sdec_set_drc.argtypes = [C.c_void_p, C.c_int, C.c_int]
            for name, ct in (("ac3h_sdec_frame_fixed", C.c_int32),
                             ("ac3h_sdec_frame_double", C.c_double)):
                fn = getattr(L, name)
                fn.restype = C.c_int
                fn.argtypes = [C.c_void_p, C.c_char_p, C.c_int, C.c_double,
                               C.c_double, C.POINTER(ct),
                               C.POINTER(C.c_int32)]
            L.ac3h_sdec_parse_fixed.restype = C.c_int
            L.ac3h_sdec_parse_fixed.argtypes = [
                C.c_void_p, C.c_char_p, C.c_int, C.c_double,
                C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p]
            L._sdec_ready = True
        self._d = L.ac3h_sdec_new(self._k)
        self._frame_fn = (L.ac3h_sdec_frame_fixed if self._k == 0
                          else L.ac3h_sdec_frame_double)
        self._ct = C.c_int32 if self._k == 0 else C.c_double
        self._dev_carry = None

    def __del__(self):
        if getattr(self, "_d", None):
            self.lib.ac3h_sdec_free(self._d, self._k)
            self._d = None

    def set_drc_enabled(self, enabled: bool):
        self.lib.ac3h_sdec_set_drc(self._d, self._k, int(enabled))

    def decode_stream(self, es: bytes, flags: int, level=None, bias=None):
        """Returns planar [nblk, nch_out, 256] in the variant's sample type.

        Default level/bias follow the reference CLI's sink conventions:
        fixed 1<<26 / 0 (audio_out_internal.h:30-32), double 1.0 / 0.0."""
        from .parse import syncinfo
        if level is None:
            level = float(1 << 26) if self._k == 0 else 1.0
        if bias is None:
            bias = 0.0
        if self.backend == "tpu":
            return self._decode_stream_device(es, flags, level)
        out_blocks = []
        pcm = np.zeros((6, 6, 256), self._np)
        nch = C.c_int32(0)
        pos = 0
        while pos + 7 <= len(es):
            size, _, _, _ = syncinfo(es[pos:pos + 7])
            if size == 0:
                pos += 1
                continue
            if pos + size > len(es):
                break
            r = self._frame_fn(self._d, es[pos:pos + size], flags,
                               level, bias,
                               pcm.ctypes.data_as(C.POINTER(self._ct)),
                               C.byref(nch))
            if r == 0:
                n = int(nch.value)
                out_blocks.append(
                    pcm.reshape(-1)[: 6 * n * 256].reshape(6, n, 256).copy())
            pos += size
        if not out_blocks:
            return np.zeros((0, 0, 256), self._np)
        return np.concatenate(out_blocks, axis=0)

    def _decode_stream_device(self, es: bytes, flags: int, level: float):
        """LIBA52_FIXED on the device: native parse-only pre-pass (dequant
        to Q30, rematrix) -> int32 filterbank/downmix pipeline
        (models.decoder.fixed_block_pipeline), bit-exact vs the CPU
        backend and the -DLIBA52_FIXED reference build."""
        import jax.numpy as jnp
        from .parse import syncinfo
        from ..models.decoder import (StreamFormat, fixed_block_pipeline,
                                      init_fixed_carry)
        L = self.lib
        freq = np.zeros((6, 6, 256), np.int32)
        blksw = np.zeros((6, 5), np.uint8)
        czero = np.zeros((6, 5), np.uint8)
        meta = np.zeros(6, np.int32)
        if self._dev_carry is None:
            self._dev_carry = init_fixed_carry()
        out_blocks = []
        pos = 0
        while pos + 7 <= len(es):
            size, _, _, _ = syncinfo(es[pos:pos + 7])
            if size == 0:
                pos += 1
                continue
            if pos + size > len(es):
                break
            r = L.ac3h_sdec_parse_fixed(
                self._d, es[pos:pos + size], flags, level,
                C.c_void_p(freq.ctypes.data), C.c_void_p(blksw.ctypes.data),
                C.c_void_p(czero.ctypes.data), C.c_void_p(meta.ctypes.data))
            pos += size
            if r != 0:
                continue
            fmt = StreamFormat(acmod=int(meta[0]), output=int(meta[1]),
                               slev_zero=bool(meta[3]),
                               chanbias=int(meta[2]))
            blocks = {
                "freq": jnp.asarray(freq),
                "blksw": jnp.asarray(blksw.astype(bool)),
                "coeff": jnp.asarray(1.0 - czero.astype(np.float32)),
                "remat": jnp.zeros((6, 256), bool),
                "bias": jnp.zeros((6,), jnp.int32),
            }
            self._dev_carry, pcm = fixed_block_pipeline(fmt)(
                self._dev_carry, blocks)
            out_blocks.append(np.asarray(pcm))
        if not out_blocks:
            return np.zeros((0, 0, 256), self._np)
        return np.concatenate(out_blocks, axis=0)


# ---------------------------------------------------------------------------
# Dense multi-lane parse pool: the host half of the end-to-end pipeline
# ---------------------------------------------------------------------------

def _bind_dense(lib):
    if getattr(lib, "_dense_ready", False):
        return
    lib.ac3h_parse_many.restype = None
    lib.ac3h_parse_many.argtypes = [
        C.POINTER(C.c_void_p), C.c_int,                    # parsers, nlanes
        C.POINTER(C.c_void_p), C.POINTER(C.c_int64),       # bufs, lens
        C.c_int, C.c_int, C.c_float, C.c_float, C.c_int,   # maxframes flags level bias pre_planes
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,    # freq_full freq_pre pre_man pre_scale
        C.c_void_p, C.c_void_p,                            # blksw coeff
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,    # remat biasv valid premix_ok
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_int,       # meta consumed nframes nthreads
    ]
    lib._dense_ready = True


class DenseBatchParser:
    """N independent native stream parsers -> one batched dense-tensor call.

    The whole batch is parsed in a single ctypes call (GIL released); the
    C++ side dequantizes ((q*a)*b, identical IEEE f32 order to the device)
    and, when a frame qualifies for the steady frequency-domain path,
    premixes the output planes with the shared mixer byte-code.  Lanes fan
    out over native threads.

    parse() returns a dict of numpy arrays shaped [nlanes, maxframes*6, ...]
    plus per-lane frame counts and consumed byte counts.
    """

    def __init__(self, nlanes: int, nthreads: int | None = None):
        self.lib = get_lib()
        _bind_dense(self.lib)
        self._parsers = [self.lib.ac3h_new() for _ in range(nlanes)]
        self.nlanes = nlanes
        if nthreads is None:
            nthreads = min(nlanes, os.cpu_count() or 1)
        self.nthreads = nthreads

    def __del__(self):
        for p in getattr(self, "_parsers", []):
            self.lib.ac3h_free(p)
        self._parsers = []

    def parse(self, bufs, maxframes: int, flags: int, level: float = 1.0,
              bias: float = 0.0, pre_planes: int = 0,
              compact: bool = False):
        """bufs: list of (bytes-like, offset) or bytes-like per lane.

        compact=True additionally emits the premixed planes in block-float
        form -- int16 mantissas ("freq_man") + one f32 scale per
        (block, plane, 16-bin group) ("freq_scale"), freq = man * scale --
        halving the bytes the decode pipeline has to ship to the device."""
        L, R = self.nlanes, maxframes * 6
        assert len(bufs) == L
        freq_full = np.empty((L, R, 6, 256), np.float32)
        freq_pre = (np.empty((L, R, pre_planes, 256), np.float32)
                    if pre_planes else None)
        pre_man = (np.empty((L, R, pre_planes, 256), np.int16)
                   if pre_planes and compact else None)
        pre_scale = (np.empty((L, R, pre_planes, PRE_GROUPS), np.float32)
                     if pre_planes and compact else None)
        blksw = np.empty((L, R, 5), np.uint8)
        coeff = np.empty((L, R, 5), np.float32)
        remat = np.empty((L, R, 256), np.uint8)
        biasv = np.empty((L, R), np.float32)
        valid = np.empty((L, maxframes), np.uint8)
        premix_ok = np.empty((L, maxframes), np.uint8)
        meta = np.zeros((L, maxframes, 8), np.int32)   # per-frame format
        consumed = np.zeros(L, np.int64)
        nframes = np.zeros(L, np.int32)

        views = []                        # keep buffer views alive
        pbuf = (C.c_void_p * L)()
        plen = (C.c_int64 * L)()
        for i, b in enumerate(bufs):
            off = 0
            if isinstance(b, tuple):
                b, off = b
            v = np.frombuffer(b, np.uint8)
            views.append(v)
            pbuf[i] = C.c_void_p(v.ctypes.data + off)
            plen[i] = len(b) - off
        pp = (C.c_void_p * L)(*self._parsers)

        addr = lambda a: C.c_void_p(0 if a is None else a.ctypes.data)
        self.lib.ac3h_parse_many(
            pp, L, pbuf, plen, maxframes, flags, level, bias, pre_planes,
            addr(freq_full), addr(freq_pre), addr(pre_man),
            addr(pre_scale), addr(blksw), addr(coeff),
            addr(remat), addr(biasv), addr(valid), addr(premix_ok),
            addr(meta), addr(consumed), addr(nframes), self.nthreads)
        return {
            "freq_full": freq_full, "freq_pre": freq_pre,
            "freq_man": pre_man, "freq_scale": pre_scale,
            "blksw": blksw, "coeff": coeff, "remat": remat, "bias": biasv,
            "valid": valid, "premix_ok": premix_ok, "meta": meta,
            "consumed": consumed, "nframes": nframes,
        }


# ---------------------------------------------------------------------------
# Raw-H2D side-info parse pool: the production host half of
# BatchedDecoder(parser="raw") -- frame bytes + per-block side-info records
# out, mantissa walk skipped (the device unpacks mantissas itself).
# ---------------------------------------------------------------------------

# numpy mirror of native/ac3host.cpp RawRecWire (#pragma pack(1)); field
# names match ops/unpack_device.py _META_KEYS, dtypes _META_WIRE_DTYPES
RAW_REC_DTYPE = np.dtype([
    ("exp_off", "<i2", (7,)), ("expstr", "i1", (7,)), ("ngrps", "i1", (7,)),
    ("cplco_off", "<i2", (5,)), ("phs_off", "<i2"), ("man_off", "<i2"),
    ("endmant", "<i2", (5,)), ("chincpl", "i1"), ("phsflginu", "i1"),
    ("cplstrt", "<i2"), ("cplend", "<i2"), ("cplbndstrc", "<i4"),
    ("ncplbnd", "i1"), ("cplstrtbnd", "i1"), ("bai", "<i2"),
    ("csnroffst", "i1"), ("cplbai", "i1"), ("babai", "i1", (5,)),
    ("lfebai", "i1"), ("cplfleak", "i1"), ("cplsleak", "i1"),
    ("dith", "i1", (5,)), ("blksw", "i1", (5,)), ("coeff", "<f4", (5,)),
    ("chanbias", "i1"), ("rematflg", "i1"), ("lfe_scale", "<f4"),
    ("lfeon", "i1"), ("lfe_out", "i1"), ("fscod", "i1"), ("halfrate", "i1"),
    ("deltba", "i1", (7, 50)),
])


def _bind_sideinfo(lib):
    if getattr(lib, "_sideinfo_ready", False):
        return
    lib.ac3h_rawrec_size.restype = C.c_int
    assert lib.ac3h_rawrec_size() == RAW_REC_DTYPE.itemsize, \
        (lib.ac3h_rawrec_size(), RAW_REC_DTYPE.itemsize)
    lib.ac3h_parse_sideinfo_many.restype = None
    lib.ac3h_parse_sideinfo_many.argtypes = [
        C.POINTER(C.c_void_p), C.c_int,                  # parsers, nlanes
        C.POINTER(C.c_void_p), C.POINTER(C.c_int64),     # bufs, lens
        C.c_int, C.c_int, C.c_float, C.c_float,          # maxframes flags level bias
        C.c_void_p, C.c_int, C.c_void_p, C.c_void_p,     # frames mb fsizes recs
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,  # valid fmt consumed nframes
        C.c_int,                                         # nthreads
    ]
    lib._sideinfo_ready = True


class SideinfoBatchParser:
    """N native stream parsers -> one batched side-info parse call.

    One ctypes call (GIL released, lanes fan out over C++ threads) per
    chunk: each lane's elementary stream is resynced, frames copied into
    a dense [nlanes, maxframes, mb] staging buffer and their per-block
    RawRecWire side-info records filled; the mantissa field is skipped
    entirely (reference walk: liba52 parse.c:336-556 -- here the device
    performs it, ops/unpack_device.py)."""

    MB_MAX = 3840                      # largest legal AC-3 frame

    def __init__(self, nlanes: int, nthreads: int | None = None):
        self.lib = get_lib()
        _bind_sideinfo(self.lib)
        self._parsers = [self.lib.ac3h_new() for _ in range(nlanes)]
        self.nlanes = nlanes
        if nthreads is None:
            nthreads = min(nlanes, os.cpu_count() or 1)
        self.nthreads = nthreads

    def __del__(self):
        for p in getattr(self, "_parsers", []):
            self.lib.ac3h_free(p)
        self._parsers = []

    def parse(self, bufs, maxframes: int, flags: int, level: float = 1.0,
              bias: float = 0.0):
        """bufs: list of (bytes-like, offset) or bytes-like per lane.

        Returns dict: frames [L, F, MB_MAX] u8, fsizes [L, F] i32,
        recs [L, F*6] RAW_REC_DTYPE, valid [L, F] u8,
        fmt [L, F, 4] i32 (acmod, output, slev_zero, have),
        consumed [L] i64, nframes [L] i32."""
        L, mb = self.nlanes, self.MB_MAX
        assert len(bufs) == L
        frames = np.zeros((L, maxframes, mb), np.uint8)
        fsizes = np.zeros((L, maxframes), np.int32)
        recs = np.zeros((L, maxframes * 6), RAW_REC_DTYPE)
        valid = np.zeros((L, maxframes), np.uint8)
        fmt = np.zeros((L, maxframes, 4), np.int32)
        consumed = np.zeros(L, np.int64)
        nframes = np.zeros(L, np.int32)

        views = []
        pbuf = (C.c_void_p * L)()
        plen = (C.c_int64 * L)()
        for i, b in enumerate(bufs):
            off = 0
            if isinstance(b, tuple):
                b, off = b
            v = np.frombuffer(b, np.uint8)
            views.append(v)
            pbuf[i] = C.c_void_p(v.ctypes.data + off)
            plen[i] = len(b) - off
        pp = (C.c_void_p * L)(*self._parsers)
        addr = lambda a: C.c_void_p(a.ctypes.data)
        self.lib.ac3h_parse_sideinfo_many(
            pp, L, pbuf, plen, maxframes, flags, level, bias,
            addr(frames), mb, addr(fsizes), addr(recs), addr(valid),
            addr(fmt), addr(consumed), addr(nframes), self.nthreads)
        return {"frames": frames, "fsizes": fsizes, "recs": recs,
                "valid": valid, "fmt": fmt, "consumed": consumed,
                "nframes": nframes}
