"""Container formats: demuxers/muxers feeding the annex-B front-end."""

from .mp4 import demux_mp4, mux_mp4, probe_mp4

__all__ = ["demux_mp4", "mux_mp4", "probe_mp4"]
