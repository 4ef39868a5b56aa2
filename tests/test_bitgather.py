"""ops.bitgather: windowed bitfield gather vs the BitReader oracle."""
import numpy as np
import jax.numpy as jnp

import ac3acm_tpu.ops.bitgather as BG

BG.INTERPRET = True


def _u16(x):
    """extract_fields returns int16 wire values; compare as u16."""
    return np.asarray(x).astype(np.int64) & 0xFFFF


def _random_case(rng, N, S, MB):
    data = rng.integers(0, 256, (N, MB), dtype=np.uint8)
    widths = rng.integers(0, 17, (N, S)).astype(np.int32)
    offs = np.zeros((N, S), np.int32)
    for n in range(N):
        # monotone offsets: cumsum of widths with random gaps, then make
        # sure each 128-slot tile stays within its 512-byte window
        gaps = rng.integers(0, 3, S)
        o = np.cumsum(widths[n] + gaps) - widths[n] - gaps
        o = np.minimum(o, MB * 8 - 17)
        offs[n] = o
    return data, offs, widths


def test_extract_fields_random():
    rng = np.random.default_rng(7)
    N, S, MB = 4, 4 * BG.TS, 1536
    data, offs, widths = _random_case(rng, N, S, MB)
    got = _u16(BG.extract_fields(
        jnp.asarray(data), jnp.asarray(offs), jnp.asarray(widths)))
    want = BG.reference_extract(data, offs, widths)
    assert (got == want).all(), np.argwhere(got != want)[:8]


def test_extract_fields_dense_16bit():
    """Worst-case density: every slot a 16-bit field back to back --
    a tile spans exactly 2048 bits and must still fit its window."""
    rng = np.random.default_rng(3)
    N, S = 2, 2 * BG.TS
    MB = (S * 16) // 8 + 192
    data = rng.integers(0, 256, (N, MB), dtype=np.uint8)
    widths = np.full((N, S), 16, np.int32)
    offs = np.tile(np.arange(S, dtype=np.int32) * 16, (N, 1))
    # misalign the second row by 5 bits
    offs[1] += 5
    got = _u16(BG.extract_fields(
        jnp.asarray(data), jnp.asarray(offs), jnp.asarray(widths)))
    want = BG.reference_extract(data, offs, widths)
    assert (got == want).all()


def test_extract_fields_tail_of_buffer():
    """Fields at the very end of the byte buffer (window slack rows)."""
    rng = np.random.default_rng(11)
    N, S, MB = 2, BG.TS, 3840
    data = rng.integers(0, 256, (N, MB), dtype=np.uint8)
    widths = rng.integers(1, 17, (N, S)).astype(np.int32)
    base = MB * 8 - 16 * S - 8
    offs = base + np.tile(np.arange(S, dtype=np.int32) * 16, (N, 1))
    got = _u16(BG.extract_fields(
        jnp.asarray(data), jnp.asarray(offs), jnp.asarray(widths)))
    want = BG.reference_extract(data, offs, widths)
    assert (got == want).all()


def test_extract_fields_shared_table():
    """Shared-table variant (the dither-orbit shape): 16-bit fields at
    16*k offsets from one table.  Group granularity follows the active
    kernel's window contract: one base per 1024-slot mega step (or per
    128-slot tile in the fallback), plus a small rank sawtooth as the
    coupled dither lattice produces."""
    rng = np.random.default_rng(5)
    TB = 262144
    table = rng.integers(0, 256, TB, dtype=np.uint8)
    G = BG.TPG * BG.TS if BG.MEGA else BG.TS
    N, S = 3, 2 * G
    offs = np.zeros((N, S), np.int32)
    for n in range(N):
        for t in range(S // G):
            base = int(rng.integers(0, 65000))
            saw = rng.integers(0, 4, G)              # rank sawtooth
            offs[n, t * G:(t + 1) * G] = \
                (base + np.arange(G) + saw) * 16
    got = _u16(BG.extract_fields_shared(
        jnp.asarray(table), jnp.asarray(offs)))
    want = BG.reference_extract(
        np.tile(table, (N, 1)), offs, np.full((N, S), 16, np.int32))
    assert (got == want).all()


def test_mega_matches_per_tile_fallback():
    """The mega-step kernel and the per-tile fallback agree bit-for-bit
    on offsets satisfying BOTH span contracts."""
    rng = np.random.default_rng(13)
    N, S, MB = 3, 2 * BG.TPG * BG.TS, 3072
    data = rng.integers(0, 256, (N, MB), dtype=np.uint8)
    widths = rng.integers(0, 17, (N, S)).astype(np.int32)
    offs = np.zeros((N, S), np.int32)
    for n in range(N):
        o = np.cumsum(widths[n]) - widths[n]
        offs[n] = np.minimum(o, MB * 8 - 17)
    old = BG.MEGA
    try:
        BG.MEGA = True
        got_mega = _u16(BG.extract_fields(
            jnp.asarray(data), jnp.asarray(offs), jnp.asarray(widths)))
        BG.MEGA = False
        got_tile = _u16(BG.extract_fields(
            jnp.asarray(data), jnp.asarray(offs), jnp.asarray(widths)))
    finally:
        BG.MEGA = old
    want = BG.reference_extract(data, offs, widths)
    assert (got_mega == want).all()
    assert (got_tile == want).all()


def test_extract_i16_table():
    """Aligned-16-bit table gather (the dither-orbit fast path): entry-
    indexed values from a shared int16 table, per-1024-slot-step span
    contract, incl. negative (high-bit) values."""
    rng = np.random.default_rng(17)
    TB = 131070
    table = rng.integers(-32768, 32768, TB).astype(np.int16)
    G = BG.TPG * BG.TS
    N, S = 2, 2 * G
    offs = np.zeros((N, S), np.int32)
    for n in range(N):
        for t in range(S // G):
            base = int(rng.integers(0, TB - 2 * G))
            saw = rng.integers(0, 4, G)
            offs[n, t * G:(t + 1) * G] = base + np.arange(G) + saw
    got = np.asarray(BG.extract_i16_table(table, jnp.asarray(offs)))
    want = table[offs]
    assert (got == want).all(), np.argwhere(got != want)[:5]
