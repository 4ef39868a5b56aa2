"""Stream demultiplexers: AC-3 elementary streams out of MPEG PS / TS.

Generator-based equivalents of the reference's resumable demux state
machine (a52dec.c:311-539) and ts_loop, plus the raw-ES frame scanner the
decoder uses.  `extract_es` doubles as the `extract_a52` tool's core
(src/extract_a52.c parity).
"""
from __future__ import annotations

from typing import Iterator

from ..host.parse import syncinfo

_MPEG1_SKIP = [0, 0, 4, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def ps_payloads(data: bytes, track: int = 0) -> Iterator[bytes]:
    """AC-3 payload chunks from an MPEG-1/2 program stream.

    track selects the substream (0x80 + track) inside private stream 1.
    """
    want = 0x80 + track
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] or data[pos + 1] or data[pos + 2] != 1:
            pos += 1
            continue
        sid = data[pos + 3]
        if sid == 0xB9:                     # program end
            return
        if sid == 0xBA:                     # pack header
            if pos + 5 > n:
                return
            if (data[pos + 4] & 0xC0) == 0x40:      # mpeg2
                if pos + 14 > n:
                    return
                pos += 14 + (data[pos + 13] & 7)
            elif (data[pos + 4] & 0xF0) == 0x20:    # mpeg1
                pos += 12
            else:
                pos += 5
            continue
        if sid < 0xB9:
            raise ValueError("video stream, not a system stream")
        if pos + 6 > n:
            return
        pes_len = (data[pos + 4] << 8) | data[pos + 5]
        if sid != 0xBD:                     # not private stream 1: skip
            pos += 6 + pes_len
            continue
        # private stream 1 PES
        if pos + 7 > n:
            return
        if (data[pos + 6] & 0xC0) == 0x80:          # mpeg2 PES
            hlen = 9 + data[pos + 8]
        else:                                       # mpeg1 PES
            hlen = 6
            while hlen < 23 and pos + hlen < n and data[pos + hlen] == 0xFF:
                hlen += 1
            if (data[pos + hlen] & 0xC0) == 0x40:
                hlen += 2
            hlen += _MPEG1_SKIP[data[pos + hlen] >> 4] + 1
        sub = data[pos + hlen] if pos + hlen < n else -1
        payload_start = pos + hlen + 4      # substream id + 3 header bytes
        payload_end = pos + 6 + pes_len
        if sub == want and payload_end <= n:
            yield data[payload_start:payload_end]
        pos = pos + 6 + pes_len


def ts_payloads(data: bytes, pid: int) -> Iterator[bytes]:
    """AC-3 PES payload chunks from an MPEG transport stream (188B packets)."""
    pos = data.find(b"\x47")
    n = len(data)
    pes_skip = 0
    while pos + 188 <= n:
        if data[pos] != 0x47:
            pos = data.find(b"\x47", pos + 1)
            if pos < 0:
                return
            continue
        pkt = data[pos:pos + 188]
        pos += 188
        ppid = ((pkt[1] << 8) | pkt[2]) & 0x1FFF
        if ppid != pid:
            continue
        ofs = 4
        if pkt[3] & 0x20:                   # adaptation field
            ofs = 5 + pkt[4]
        if ofs >= 188:
            continue
        if pkt[1] & 0x40:                   # payload unit start: PES header
            p = pkt[ofs:]
            if len(p) < 9 or p[0] or p[1] or p[2] != 1:
                continue
            hlen = 9 + p[8]
            yield p[hlen:]
        else:
            yield pkt[ofs:]


def es_frames(es: bytes, start: int = 0) -> Iterator[tuple[bytes, int, int]]:
    """Frame-sync scan over a raw elementary stream.

    Yields (frame_bytes, sample_rate, bit_rate); resyncs byte-wise on
    damage like the reference (a52dec.c:271-276).
    """
    pos = start
    n = len(es)
    while pos + 7 <= n:
        size, flags, srate, brate = syncinfo(es[pos:pos + 7])
        if size == 0:
            pos += 1
            continue
        if pos + size > n:
            return
        yield es[pos:pos + size], srate, brate
        pos += size


def extract_es(data: bytes, kind: str = "auto", track: int = 0,
               pid: int = 0) -> bytes:
    """Extract a raw AC-3 ES from a container (extract_a52 parity)."""
    if kind == "auto":
        if len(data) >= 4 and data[0] == 0x47 and len(data) % 188 == 0:
            kind = "ts"
        elif data[:4] == b"\x00\x00\x01\xba":
            kind = "ps"
        else:
            kind = "es"
    if kind == "es":
        return data
    if kind == "ps":
        return b"".join(ps_payloads(data, track))
    if kind == "ts":
        return b"".join(ts_payloads(data, pid))
    raise ValueError(f"unknown container kind {kind!r}")
