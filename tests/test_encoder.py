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
