"""Checkpoint / resume of per-stream codec state (SURVEY.md §5).

In codec terms the checkpoint is the carried stream state: decoder OLA
delay planes + downmixed flag (+ the host parser's side-info caches),
encoder MDCT history + csnroffst.  All of it is a plain pytree of arrays,
so save/restore is one .npz (or hand to orbax for sharded checkpoints).
"""
from __future__ import annotations


import numpy as np


def _pack_parser_state(s) -> dict:
    """DecoderState -> flat dict of plain npz-safe arrays (no pickle, so a
    checkpoint file is pure data and loading an untrusted one cannot
    execute code)."""
    import json
    from ..host.parse import ChannelBA
    blobs = {}
    scalars = {}
    for name, val in vars(s).items():
        if name == "dynrng_call":
            continue            # runtime callback, not stream state
        if isinstance(val, ChannelBA):
            scalars[name] = [int(val.bai), int(val.deltbae)]
            blobs["pba_" + name] = np.asarray(val.deltba)
        elif isinstance(val, list):          # s.ba: list[ChannelBA]
            scalars[name] = [[int(b.bai), int(b.deltbae)] for b in val]
            for i, b in enumerate(val):
                blobs[f"pba_{name}{i}"] = np.asarray(b.deltba)
        elif isinstance(val, np.ndarray):
            blobs["parr_" + name] = val
        elif isinstance(val, (bool, np.bool_)):
            scalars[name] = ["b", int(val)]
        elif isinstance(val, (float, np.floating)):
            scalars[name] = ["f", float(val)]
        else:
            scalars[name] = ["i", int(val)]
    blobs["pscalars"] = np.frombuffer(
        json.dumps(scalars).encode(), np.uint8).copy()
    return blobs


def _unpack_parser_state(z):
    import json
    from ..host.parse import ChannelBA, DecoderState
    s = DecoderState()
    scalars = json.loads(z["pscalars"].tobytes().decode())
    for name, spec in scalars.items():
        cur = getattr(s, name)
        if isinstance(cur, ChannelBA):
            setattr(s, name, ChannelBA(bai=spec[0], deltbae=spec[1],
                                       deltba=z[f"pba_{name}"].copy()))
        elif isinstance(cur, list):
            setattr(s, name, [
                ChannelBA(bai=bi, deltbae=de,
                          deltba=z[f"pba_{name}{i}"].copy())
                for i, (bi, de) in enumerate(spec)])
        else:
            kind, v = spec
            if kind == "b":
                setattr(s, name, bool(v))
            elif kind == "f":
                setattr(s, name, np.float32(v))
            else:
                setattr(s, name, int(v))
    for key in z.files:
        if key.startswith("parr_"):
            setattr(s, key[len("parr_"):], z[key].copy())
    return s


def save_decode_state(path: str, carry, parser=None):
    """carry = (delay [.., 6, 128], downmixed [..]) from the device pipeline."""
    delay, downmixed = carry
    blobs = {"delay": np.asarray(delay), "downmixed": np.asarray(downmixed)}
    if parser is not None:
        blobs.update(_pack_parser_state(parser.s))
    np.savez(path, **blobs)


def load_decode_state(path: str):
    """-> (carry, parser_state_or_None)."""
    import jax.numpy as jnp
    z = np.load(path, allow_pickle=False)
    carry = (jnp.asarray(z["delay"]), jnp.asarray(z["downmixed"]))
    pstate = None
    if "pscalars" in z:
        pstate = _unpack_parser_state(z)
    return carry, pstate


def save_encode_state(path: str, last_samples, csnroffst):
    np.savez(path, last=np.asarray(last_samples),
             csnr=np.asarray(csnroffst))


def load_encode_state(path: str):
    z = np.load(path)
    return z["last"], z["csnr"]
