"""TPU back-end: batched, jit-compiled exact-integer HEVC reconstruction.

The host front-end (decoder.frontend) emits a FramePlan; plan_compile turns
it into fixed-shape tensor batches; the stages here execute them under jit:

  mc        - motion compensation (batched gathers + separable FIR)
  intra     - wavefront-batched intra prediction
  residual  - dequant + inverse transform + add (batched per size)
  deblock   - whole-frame two-pass loop filter
  sao       - whole-frame sample-adaptive offset

All arithmetic is int32-exact, matching the NumPy scalar model bit for bit.
"""

import jax as _jax

# Persistent-cache stability: with full tracebacks in MLIR locations, the
# Pallas/Mosaic custom-call payloads embed the CALLER stack, so the same
# frame_step compiled from bench.py vs the product pipeline hashed to
# different cache keys and every fresh process paid a 8-40 min recompile.
# Innermost-frame-only locations make keys depend only on this package's
# source (verified: identical keys across distinct driver scripts).
_jax.config.update("jax_include_full_tracebacks_in_locations", False)

from .backend import TpuBackend
