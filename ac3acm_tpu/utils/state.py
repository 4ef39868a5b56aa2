"""Checkpoint / resume of per-stream codec state (SURVEY.md §5).

In codec terms the checkpoint is the carried stream state: decoder OLA
delay planes + downmixed flag (+ the host parser's side-info caches),
encoder MDCT history + csnroffst.  All of it is a plain pytree of arrays,
so save/restore is one .npz (or hand to orbax for sharded checkpoints).
"""
from __future__ import annotations


import numpy as np


def save_decode_state(path: str, carry, parser=None):
    """carry = (delay [.., 6, 128], downmixed [..]) from the device pipeline."""
    delay, downmixed = carry
    blobs = {"delay": np.asarray(delay), "downmixed": np.asarray(downmixed)}
    if parser is not None:
        import pickle
        blobs["parser"] = np.frombuffer(pickle.dumps(parser.s), np.uint8)
    np.savez(path, **blobs)


def load_decode_state(path: str):
    """-> (carry, parser_state_or_None)."""
    import jax.numpy as jnp
    z = np.load(path, allow_pickle=False)
    carry = (jnp.asarray(z["delay"]), jnp.asarray(z["downmixed"]))
    pstate = None
    if "parser" in z:
        import pickle
        pstate = pickle.loads(z["parser"].tobytes())
    return carry, pstate


def save_encode_state(path: str, last_samples, csnroffst):
    np.savez(path, last=np.asarray(last_samples),
             csnr=np.asarray(csnroffst))


def load_encode_state(path: str):
    z = np.load(path)
    return z["last"], z["csnr"]
