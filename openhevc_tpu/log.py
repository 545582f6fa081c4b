"""Logging + metrics for the decoder runtime.

The reference exposes one observability knob (libOpenHevcSetDebugMode ->
av_log_set_level(AV_LOG_DEBUG), openHevcWrapper.c:400-404) plus printf
tracing.  Here the analog is the standard `logging` tree under the
"openhevc_tpu" logger, and a per-decoder `DecodeStats` counter block
surfaced through the API (get_stats) and the CLI (-v).
"""

import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("openhevc_tpu")


def set_debug_mode(val: int):
    """libOpenHevcSetDebugMode analog: 1 -> DEBUG logs on stderr."""
    if val == 1:
        if not logger.handlers:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter(
                "[openhevc_tpu %(levelname)s] %(message)s"))
            logger.addHandler(h)
        logger.setLevel(logging.DEBUG)
    elif val == 0:
        logger.setLevel(logging.WARNING)


@dataclass
class DecodeStats:
    """Counters a production deployment scrapes (SURVEY §5 metrics)."""
    nals: int = 0
    aus: int = 0
    frames_decoded: int = 0
    frames_output: int = 0
    md5_ok: int = 0
    md5_fail: int = 0
    errors: int = 0
    concealed_refs: int = 0
    bytes_in: int = 0
    decode_time_s: float = 0.0
    t0: float = field(default_factory=time.monotonic, repr=False)

    def as_dict(self):
        d = {k: getattr(self, k) for k in (
            "nals", "aus", "frames_decoded", "frames_output", "md5_ok",
            "md5_fail", "errors", "concealed_refs", "bytes_in")}
        d["decode_time_s"] = round(self.decode_time_s, 3)
        wall = time.monotonic() - self.t0
        d["fps"] = round(self.frames_decoded / wall, 2) if wall > 0 else 0.0
        return d
