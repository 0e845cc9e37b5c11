"""Frame-accurate random access over a decoded stream with an LRU cache.

Parity: AMTSource (Amatsukaze/AMTSource.hpp:42-941) — the reference binds
decoded frames to the reform's FilterSourceFrame list and serves AviSynth
GetFrame calls from an intrusive LRU cache, falling back to forward decode
or a keyframe byte-seek. Here the decode is a pluggable sequential iterator
(ffmpeg or synthetic); random access restarts the stream when asked to go
backwards past the cache, which matches the wizard/filter access patterns
(mostly monotone with small look-backs).
"""

from __future__ import annotations

from collections import OrderedDict


class CachedFrameSource:
    """get_frame(n) -> (Y, U, V) with an LRU cache (ref PutFrame/GetFrame,
    AMTSource.hpp:410-426, 721-780)."""

    def __init__(self, open_stream, cache_frames: int = 32):
        """open_stream: callable() -> iterator of (Y, U, V) frames."""
        self._open = open_stream
        self.cache_frames = cache_frames
        self._cache: OrderedDict[int, tuple] = OrderedDict()
        self._it = None
        self._pos = 0  # index the iterator will yield next
        self.num_restarts = 0
        self.num_decoded = 0

    def _restart(self) -> None:
        self._it = self._open()
        self._pos = 0
        self.num_restarts += 1

    def _put(self, n: int, frame: tuple) -> None:
        self._cache[n] = frame
        self._cache.move_to_end(n)
        while len(self._cache) > self.cache_frames:
            self._cache.popitem(last=False)

    def get_frame(self, n: int):
        if n < 0:
            raise IndexError(n)
        hit = self._cache.get(n)
        if hit is not None:
            self._cache.move_to_end(n)
            return hit
        if self._it is None or n < self._pos:
            self._restart()
        while True:
            try:
                frame = next(self._it)
            except StopIteration:
                # past EOF: substitute the newest cached frame like the
                # reference's failed-frame substitution (:760-780)
                if self._cache:
                    return self._cache[next(reversed(self._cache))]
                raise IndexError(n) from None
            idx = self._pos
            self._pos += 1
            self.num_decoded += 1
            self._put(idx, frame)
            if idx == n:
                return frame
