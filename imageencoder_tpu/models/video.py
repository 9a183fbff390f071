"""GOP / motion-compensated video codec (VideoEncoder/VideoDecoder parity).

Implemented in the video milestone; see SURVEY §3.3/§3.4.
"""

from __future__ import annotations


class VideoEncoder:  # pragma: no cover - placeholder until video milestone
    def __init__(self, *a, **k):
        raise NotImplementedError("video pipeline lands in a later milestone")


class VideoDecoder:  # pragma: no cover - placeholder until video milestone
    def __init__(self, *a, **k):
        raise NotImplementedError("video pipeline lands in a later milestone")
