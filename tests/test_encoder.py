"""Encoder tests: bit-exact frames vs the reference encoder + round trip."""
import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.encoder import Encoder, make_config
from tests.refbuild import get_ref
from tests.test_decode import make_pcm


@pytest.mark.parametrize("nch,freq,kbps", [
    (1, 48000, 96), (2, 48000, 192), (2, 44100, 128), (3, 48000, 256),
    (4, 48000, 384), (5, 48000, 448), (6, 48000, 640), (2, 32000, 192),
])
def test_bit_exact_frames(nch, freq, kbps):
    ref = get_ref()
    pcm = make_pcm(nch, 3, seed=nch * 7 + kbps)
    ref_es = ref.encode(pcm, freq, kbps)
    my_es = Encoder(freq, kbps * 1000, nch).encode(pcm)
    assert my_es == ref_es


def test_all_19_bitrates_bit_exact():
    """Every standard bitrate (32..640 kbps, ac3_bitratetab) produces
    byte-identical frames to the reference — or fails rate control exactly
    when the reference does (SURVEY §7.4: 19 bitrates acceptance)."""
    import jax
    ref = get_ref()
    # quiet mono content so even 32 kbps has a feasible allocation
    pcm = (make_pcm(1, 1, seed=77) // 64).astype(np.int16)
    for kbps in [int(b) for b in T.BIT_RATES]:
        ref_es = ref.encode(pcm, 48000, kbps)
        try:
            # eager: one tiny frame per config -- 19 jit compiles would
            # cost far more than op-by-op dispatch here
            with jax.disable_jit():
                my_es = Encoder(48000, kbps * 1000, 1).encode(pcm)
        except RuntimeError:
            my_es = None
        if my_es is None:
            # reference signals failure with an unterminated search; its
            # wrapper still returns bytes -- ours must only fail when the
            # frame genuinely cannot fit, which this quiet signal avoids
            raise AssertionError(f"rate control failed at {kbps} kbps")
        assert my_es == ref_es, f"mismatch at {kbps} kbps"


def test_bits_for_snro_equals_materialized_bap():
    """The per-bin rate model (ops.alloc.bits_for_snro, the SNR search's
    cost function) must equal mantissa_bits(bap_from_mask(...)) -- the
    materialized ground truth -- for random masks/exponents and offsets
    across the whole search lattice."""
    import jax.numpy as jnp
    from ac3acm_tpu.ops import alloc as AL
    rng = np.random.default_rng(42)
    B, C = 8, 6
    floor = int(T.FLOORTAB[4])
    ends_np = np.full((B, C), 223, np.int32)
    ends_np[:, C - 1] = 7
    exp = rng.integers(0, 25, (B, C, 256)).astype(np.int32)
    bins = np.arange(256)
    live_np = bins[None, None, :] < ends_np[..., None]
    psd = jnp.asarray(np.where(live_np, 3072 - (exp << 7), 0))
    live = jnp.asarray(live_np)
    mask = jnp.asarray(rng.integers(0, 4000, (B, C, 50)).astype(np.int32))
    ends = jnp.asarray(ends_np)
    starts = jnp.zeros_like(ends)
    for c, f in ((0, 0), (10, 3), (40, 0), (40, 15), (63, 15), (25, 7)):
        snro = np.int32((((c - 15) << 4) + f) << 2)
        fast = np.asarray(AL.bits_for_snro(psd, live, mask, snro, floor))
        bap = AL.bap_from_mask(psd, mask, snro, floor, starts, ends)
        slow = np.asarray(AL.mantissa_bits(bap, ends))
        assert (fast == slow).all(), (c, f)


def test_config_validation():
    with pytest.raises(ValueError):
        make_config(11000, 96000, 2)      # not in any halfrate row
    with pytest.raises(ValueError):
        make_config(48000, 33000, 2)
    with pytest.raises(ValueError):
        make_config(48000, 192000, 7)
    cfg = make_config(24000, 96000, 2)    # halfrate bsid
    assert cfg.halfratecod == 1 and cfg.fscod == 0
    assert make_config(48000, 192000, 2).frame_size == 384


def test_rate_control_failure():
    # 32 kbps stereo cannot fit: both encoders must fail identically
    pcm = make_pcm(2, 1, seed=8)
    enc = Encoder(48000, 32000, 2)
    with pytest.raises(RuntimeError):
        enc.encode(pcm)


def test_roundtrip_through_own_decoder():
    """encode -> decode (ours) -> compare with the original PCM (PSNR)."""
    from ac3acm_tpu.models.decoder import Decoder
    pcm = make_pcm(2, 3, seed=21)
    es = Encoder(48000, 192000, 2).encode(pcm)
    dec = Decoder()
    out, fmt = dec.decode_stream(es, T.A52_STEREO | T.A52_ADJUST_LEVEL,
                                 level=1.0, bias=0.0)
    assert fmt.nch_out == 2
    # [nblk, 2, 256] planar -> interleaved [-1, 2]; the codec chain has 256
    # samples of algorithmic latency (MDCT history + OLA)
    mine = np.moveaxis(out, 1, 2).reshape(-1, 2) * 32768.0
    delay = 256
    mine = mine[delay:]
    orig = pcm[: mine.shape[0]].astype(np.float64)
    err = mine - orig
    snr = 10 * np.log10((orig ** 2).mean() / (err ** 2).mean())
    # the reference "simplest AC3 encoder" design (fixed psychoacoustics,
    # no coupling) yields ~15 dB on this dense noisy test signal; the same
    # stream through the reference codec measures identically
    assert snr > 12.0, snr


def test_encoder_is_reentrant():
    """Two interleaved encoders do not share state (unlike the reference's
    static ac3enc_state, SURVEY.md §5 race-detection note)."""
    pcm_a = make_pcm(2, 2, seed=31)
    pcm_b = make_pcm(2, 2, seed=32)
    ea, eb = Encoder(48000, 192000, 2), Encoder(48000, 192000, 2)
    out_a1 = ea.encode(pcm_a[:1536])
    out_b1 = eb.encode(pcm_b[:1536])
    out_a2 = ea.encode(pcm_a[1536:])
    out_b2 = eb.encode(pcm_b[1536:])
    ea2 = Encoder(48000, 192000, 2)
    assert ea2.encode(pcm_a) == out_a1 + out_a2
    eb2 = Encoder(48000, 192000, 2)
    assert eb2.encode(pcm_b) == out_b1 + out_b2


@pytest.mark.parametrize("nch,freq,kbps", [
    (2, 48000, 192), (6, 48000, 640), (2, 44100, 128), (1, 32000, 96),
])
def test_native_packer_byte_identity(nch, freq, kbps):
    """The threaded C++ batch packer (native/ac3host.cpp:ac3h_pack_frames)
    emits byte-identical frames to the spec-form Python pack_frame."""
    from ac3acm_tpu.host import pack as PK
    from ac3acm_tpu.models.encoder import encode_pipeline
    cfg = make_config(freq, kbps * 1000, nch)
    fn = encode_pipeline(cfg)
    rng = np.random.default_rng(nch + kbps)
    B = 5
    pcm = (rng.standard_normal((B, 1536, nch)) * 8000).astype(np.int32)
    res = fn(pcm, np.zeros((B, nch, 256), np.int32),
             np.full((B,), 40, np.int32))
    res = {k: np.asarray(v) for k, v in res.items()}
    assert res["ok"].all()
    ref = [PK.pack_frame(cfg, res, b) for b in range(B)]
    nat = PK.pack_frames_native(cfg, res)
    assert nat == ref


@pytest.mark.parametrize("nch,freq,kbps", [
    (2, 48000, 192), (6, 48000, 640), (2, 44100, 128), (1, 32000, 96),
    (3, 48000, 256), (4, 48000, 384), (5, 48000, 448), (6, 44100, 448),
    (1, 48000, 64), (2, 48000, 640),
])
def test_device_packer_byte_identity(nch, freq, kbps):
    """The on-device bit packer (ops/pack_device.py) emits byte-identical
    frames to the spec-form Python pack_frame."""
    from ac3acm_tpu.host import pack as PK
    from ac3acm_tpu.models.encoder import encode_pipeline
    from ac3acm_tpu.ops.pack_device import pack_frames_device
    cfg = make_config(freq, kbps * 1000, nch)
    fn = encode_pipeline(cfg)
    rng = np.random.default_rng(nch * 3 + kbps)
    B = 4
    pcm = (rng.standard_normal((B, 1536, nch)) * 8000).astype(np.int32)
    res = fn(pcm, np.zeros((B, nch, 256), np.int32),
             np.full((B,), 40, np.int32))
    res_h = {k: np.asarray(v) for k, v in res.items()}
    assert res_h["ok"].all()
    ref = [PK.pack_frame(cfg, res_h, b) for b in range(B)]
    dev = np.asarray(pack_frames_device(cfg)(
        res["bap"], res["qmant"], res["enc_exp"], res["strat"],
        res["csnroffst"], res["fsnroffst"]))
    assert [dev[b].tobytes() for b in range(B)] == ref


def test_batched_encoder_pack_modes_agree():
    """BatchedEncoder(pack='device') == pack='native', byte-for-byte,
    including the multi-frame scan path."""
    from ac3acm_tpu.parallel.encode import BatchedEncoder
    pcm = make_pcm(2, 4, seed=5)
    outs = {}
    for mode in ("device", "native"):
        enc = BatchedEncoder(3, 48000, 192000, 2, pack=mode)
        stacked = np.stack([pcm, pcm, pcm])
        outs[mode] = enc.encode_frames(stacked)
    assert outs["device"] == outs["native"]


def test_pack_scan_primitives_match_brute_force():
    """The device packer's two-level scans (prefix sum; 'first two class
    members after me' pointer doubling) against brute force, at lengths
    that hit both the chunked and the plain code paths."""
    import jax.numpy as jnp
    from ac3acm_tpu.ops.pack_device import _first_two_after, _psum_incl

    rng = np.random.default_rng(0)
    for n in (1136, 448, 64, 33):
        x = rng.integers(0, 20, (4, n)).astype(np.int16)
        got = np.asarray(_psum_incl(jnp.asarray(x)))
        assert (got == np.cumsum(x, -1).astype(np.int16)).all(), n

    n = 1136
    q = rng.integers(0, 11, (3, n)).astype(np.int32)
    cls = rng.integers(0, 5, (3, n))
    m = np.stack([cls == c for c in (1, 2, 3)], axis=-2)
    v1, v2, cnt = (np.asarray(v)
                   for v in _first_two_after(jnp.asarray(q), jnp.asarray(m)))
    for b in range(3):
        for c in range(3):
            for i in range(0, n, 61):
                pos = [j for j in range(i, n) if m[b, c, j]][:2]
                assert cnt[b, c, i] == len(pos)
                if len(pos) >= 1:
                    assert v1[b, c, i] == q[b, pos[0]] & 15
                if len(pos) >= 2:
                    assert v2[b, c, i] == q[b, pos[1]] & 15
