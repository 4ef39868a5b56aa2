"""CodecDriver facade: the ACM DriverProc lifecycle as one object."""
import os

import numpy as np
import pytest

from ac3acm_tpu.io.driver import CodecDriver, FormatTagDetails
from ac3acm_tpu.io.stream import Ac3Format, PcmFormat
from ac3acm_tpu.utils.config import CodecConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bench_51_448.ac3")


def test_formattag_and_format_details():
    with CodecDriver() as drv:
        tags = {t.tag: t for t in drv.formattag_details()}
        assert isinstance(tags["ac3"], FormatTagDetails)
        assert tags["ac3"].n_formats == 342          # 3 x 6 x 19
        assert tags["pcm"].n_formats == 18           # 3 x 6
        ac3 = drv.format_details("ac3")
        assert len(set(ac3)) == 342
        assert all(drv.is_valid(f) for f in ac3)
        assert "AC-3" in drv.format_name(ac3[0])
        assert "PCM" in drv.format_name(drv.format_details("pcm")[0])
        with pytest.raises(ValueError):
            drv.format_details("mp3")


def test_format_suggest_honours_config():
    drv = CodecDriver(cfg=CodecConfig(multichannel=False))
    sug = drv.format_suggest(Ac3Format(6, 48000, 448))
    assert sug == PcmFormat(2, 48000)               # stereo downmix pref
    drv2 = CodecDriver(cfg=CodecConfig(multichannel=True))
    assert drv2.format_suggest(Ac3Format(6, 48000, 448)).channels == 6
    # PCM -> AC-3 default bitrate rule (96 kbps/ch config default)
    enc = drv.format_suggest(PcmFormat(2, 48000))
    assert isinstance(enc, Ac3Format) and enc.bitrate == 192


def test_stream_open_validation():
    drv = CodecDriver()
    with pytest.raises(ValueError):                 # rate mismatch refused
        drv.stream_open(Ac3Format(2, 48000, 192), PcmFormat(2, 44100))
    with pytest.raises(ValueError):                 # same-type must be equal
        drv.stream_open(Ac3Format(2, 48000, 192), Ac3Format(2, 48000, 256))
    with pytest.raises(ValueError):    # decode 5.1 -> 4ch: not a converter
        drv.stream_open(Ac3Format(6, 48000, 448), PcmFormat(4, 48000))
    with pytest.raises(ValueError):    # encode channel mismatch
        drv.stream_open(PcmFormat(4, 48000), Ac3Format(2, 48000, 192))
    with pytest.raises(ValueError):    # multichannel disabled by config
        CodecDriver(cfg=CodecConfig(multichannel=False)).stream_open(
            Ac3Format(6, 48000, 448), PcmFormat(6, 48000))
    # native-channel decode is a valid pair
    s = drv.stream_open(Ac3Format(6, 48000, 448), PcmFormat(6, 48000))
    assert s.mode == "decode"
    # close() deregisters and blocks further use
    s.close()
    assert s not in drv._streams
    with pytest.raises(RuntimeError):
        s.convert(b"\x0b\x77")


def test_stream_decode_encode_copy_roundtrip():
    es = open(GOLDEN, "rb").read()
    with CodecDriver(cfg=CodecConfig(multichannel=False)) as drv:
        src = Ac3Format(6, 48000, 448)
        dst = drv.format_suggest(src)
        dec = drv.stream_open(src, dst)
        assert dec.mode == "decode"
        pcm = dec.convert(es[: 3 * src.block_align])
        assert pcm.dtype == np.int16 and pcm.shape == (3 * 1536, 2)
        # stream_size worst-case bound actually bounds the output
        assert pcm.nbytes <= dec.size(3 * src.block_align)

        enc_fmt = Ac3Format(2, 48000, 192)
        enc = drv.stream_open(PcmFormat(2, 48000), enc_fmt)
        assert enc.mode == "encode"
        out = enc.convert(pcm)
        assert out[:2] == b"\x0b\x77"
        assert len(out) == 3 * enc_fmt.block_align
        assert len(out) <= enc.size(pcm.nbytes)

        cp = drv.stream_open(src, src)
        assert cp.mode == "copy"
        assert cp.convert(b"abc") == b"abc" and cp.size(7) == 7
    assert not drv._streams                          # close() drained


def test_configure_and_save(tmp_path):
    p = str(tmp_path / "drv.json")
    drv = CodecDriver(config_path=p)
    cfg = drv.configure(dolby_surround=True, multichannel=False)
    assert cfg.dolby_surround and not cfg.multichannel
    drv.save_config()
    assert CodecConfig.load(p) == cfg
    # the configured driver decodes to Dolby-flavour stereo
    import ac3acm_tpu.tables as T
    assert drv.cfg.output_flags(T.A52_3F2R) == T.A52_DOLBY
