"""ac3acm_tpu: a TPU-native AC-3 (ATSC A/52) codec framework.

Rebuild of the capabilities of the AC-3 ACM codec (liba52 decoder +
Bellard/fccHandler encoder + ACM shell) as a batched JAX/XLA pipeline with
a native C++ host runtime:

  models.decoder / models.encoder   per-stream codecs (TPU device path)
  parallel.pipeline / .transcode    batched multi-stream + mesh sharding
  host.native                       C++ pre-pass parser & bit-exact decoder
  io.stream                         ACM-shell-equivalent streaming layer
  io.sinks / io.demux               libao-equivalent outputs, PS/TS demux
  a52                               drop-in a52_* / AC3_encode_* API names
  cli                               a52dec-equivalent command-line tools
"""

__version__ = "0.1.0"

from . import tables  # noqa: F401

__all__ = ["tables", "a52"]
