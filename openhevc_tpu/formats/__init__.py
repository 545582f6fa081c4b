"""Container formats: demuxers/muxers feeding the annex-B front-end."""

from .mp4 import demux_mp4, mux_mp4, probe_mp4
from .ts import demux_ts, mux_ts, probe_ts
from .mkv import demux_mkv, mux_mkv, probe_mkv
from .ogg import demux_ogg, mux_ogg, probe_ogg

__all__ = ["demux_mp4", "mux_mp4", "probe_mp4",
           "demux_ts", "mux_ts", "probe_ts",
           "demux_mkv", "mux_mkv", "probe_mkv",
           "demux_ogg", "mux_ogg", "probe_ogg"]
