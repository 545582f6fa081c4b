"""openhevc_tpu: a TPU-native HEVC/H.265 decode framework.

Architecture (vs reference smajida/openHEVC, see SURVEY.md):
  - host front-end (sequential): NAL demux, RBSP unescape, parameter-set /
    slice-header parsing, CABAC entropy decode, MV derivation -> dense
    per-frame "plan tensors" (coefficients, PU motion fields, filter params).
  - TPU back-end (batched, jit/Pallas): dequant+IDCT+residual add, intra
    prediction wavefronts, qpel/epel motion compensation, deblocking, SAO,
    SHVC upsampling -- all exact-integer kernels on HBM frame planes.

The reference implements the same pipeline as lock-synchronized pthreads over
mutable frame buffers (libavcodec/hevc.c); here intra-frame parallelism is
expressed as batched tensor ops and grid iteration, and multi-chip scaling as
jax.sharding over a device mesh (frame-level data parallelism + SHVC layer
pipelining).
"""

__version__ = "0.1.0"
