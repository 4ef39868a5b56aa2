"""Aux subsystems: stream_size math, checkpoint/resume, config, meter."""
import numpy as np

import ac3acm_tpu.tables as T
from ac3acm_tpu.io.stream import Ac3Format, PcmFormat, stream_size
from ac3acm_tpu.utils.config import CodecConfig
from ac3acm_tpu.utils.meter import FpsMeter
from ac3acm_tpu.utils.state import (load_decode_state, load_encode_state,
                                    save_decode_state, save_encode_state)


def test_stream_size():
    ac3 = Ac3Format(2, 48000, 192)          # 768-byte frames
    pcm = PcmFormat(2, 48000)
    # 3 frames of AC-3 -> 3*1536 samples * 4 bytes
    assert stream_size(True, 3 * 768, ac3, pcm) == 3 * 1536 * 4
    # PCM -> AC-3: nfr+1 frames of slack
    assert stream_size(False, 2 * 1536 * 4, ac3, pcm) == 3 * 768
    # destination queries
    assert stream_size(True, 1536 * 4, ac3, pcm, query_source=False) == 768
    assert stream_size(False, 768, ac3, pcm, query_source=False) == 1536 * 4


def test_checkpoint_resume(tmp_path):
    """Resuming a decode from a saved carry continues identically."""
    from ac3acm_tpu.models.decoder import (StreamFormat, block_pipeline,
                                           init_carry)
    rng = np.random.default_rng(5)
    fmt = StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO,
                       slev_zero=False, chanbias=31)
    blocks = {
        "freq": (rng.standard_normal((6, 6, 256)).astype(np.float32) * 100
                 * np.float32(2.0 ** -15)),
        "blksw": np.zeros((6, 5), bool),
        "coeff": np.ones((6, 5), np.float32),
        "remat": np.zeros((6, 256), bool),
        "bias": np.zeros(6, np.float32),
    }
    fn = block_pipeline(fmt)
    c0 = init_carry()
    c1, p1 = fn(c0, blocks)
    path = str(tmp_path / "state.npz")
    save_decode_state(path, c1)
    c1b, _ = load_decode_state(path)
    _, p2a = fn(c1, blocks)
    _, p2b = fn(c1b, blocks)
    np.testing.assert_array_equal(np.asarray(p2a), np.asarray(p2b))

    save_encode_state(str(tmp_path / "enc.npz"),
                      np.zeros((1, 2, 256), np.int32), np.array([40]))
    last, csnr = load_encode_state(str(tmp_path / "enc.npz"))
    assert last.shape == (1, 2, 256) and csnr[0] == 40


def test_config_roundtrip(tmp_path):
    cfg = CodecConfig(multichannel=False, dolby_surround=True)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    cfg2 = CodecConfig.load(p)
    assert cfg2 == cfg
    assert cfg2.output_flags(T.A52_3F2R) == T.A52_DOLBY
    assert CodecConfig().default_bitrate(2) == 128000
    assert CodecConfig().default_bitrate(6) == 576000


def test_meter(capsys):
    m = FpsMeter(48000, period=0.0, enabled=True)
    m.tick(10, streams=4)
    m.close()
    err = capsys.readouterr().err
    assert "frames" in err and "realtime" in err
