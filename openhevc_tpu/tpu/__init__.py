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

from .backend import TpuBackend
