"""Sink blocks (reference src/vector_sink.rs, file_sink.rs, null_sink.rs,
debug_sink.rs)."""

from __future__ import annotations

import numpy as np

from ..io import rawfile
from ..streams import Tag
from .base import Block


class VectorSink(Block):
    """Collects samples + tags; the main test sink
    (reference src/vector_sink.rs:18-58)."""

    n_out = 0
    domain = "host"

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self._tags: list[Tag] = []
        self._pos = 0

    def apply(self, x):
        self._chunks.append(np.asarray(x))
        self._pos += len(self._chunks[-1])
        return ()

    def accept_tags(self, tags: list[Tag], offset: int):
        self._tags.extend(Tag(t.pos + offset, t.key, t.val) for t in tags)

    def data(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0)
        return np.concatenate(self._chunks)

    def tags(self) -> list[Tag]:
        return sorted(self._tags)


class NullSink(Block):
    n_out = 0
    domain = "host"

    def apply(self, x):
        return ()


class DeviceFoldSink(Block):
    """Device-side reducing sink for ``Graph.compile_device_loop``:
    folds every chunk into a carried scalar/pytree with a traceable
    function, so per-sample output never leaves the device inside the
    compiled loop.  Default fold: running sum of the real part.

    Under the ordinary runners it accumulates the same reduction on the
    host (``total()``), so a graph using it stays runnable everywhere.
    """

    n_out = 0
    domain = "host"

    def __init__(self, fn=None, init: float = 0.0):
        self._fn = fn
        self._init = float(init)
        self._total = float(init)

    # ---- device loop protocol ----
    def fold_init(self):
        import jax.numpy as jnp

        return jnp.float32(self._init)

    def fold(self, carry, *xs):
        import jax.numpy as jnp

        if self._fn is not None:
            return self._fn(carry, *xs)
        return carry + jnp.sum(jnp.real(xs[0])).astype(jnp.float32)

    # ---- ordinary runners ----
    def apply(self, x):
        if self._fn is None:
            self._total += float(np.sum(np.real(np.asarray(x))))
        return ()

    def total(self) -> float:
        return self._total


def _debug_print(x, limit: int, tag: str) -> None:
    arr = np.asarray(x)
    for v in arr[:limit]:
        print(f"{tag}: {v}")
    if len(arr) > limit:
        print(f"{tag}: ... {len(arr) - limit} more")


class DebugSink(Block):
    """Prints samples (reference src/debug_sink.rs)."""

    n_out = 0
    domain = "host"

    def __init__(self, limit: int = 32):
        self.limit = limit

    def apply(self, x):
        _debug_print(x, self.limit, "debug")
        return ()


class FileSink(Block):
    """Raw sample file sink (reference src/file_sink.rs; Mode::{Create,
    Overwrite,Append} maps to 'xb'/'wb'/'ab')."""

    n_out = 0
    domain = "host"

    def __init__(self, path: str, mode: str = "overwrite"):
        self.path = path
        self.mode = {"create": "xb", "overwrite": "wb", "append": "ab"}[mode]
        self._first = True

    def apply(self, x):
        m = self.mode if self._first else "ab"
        rawfile.write_samples(self.path, np.asarray(x), mode=m)
        self._first = False
        return ()


class DebugFilter(Block):
    """Pass-through that prints samples (reference src/debug_sink.rs
    DebugFilter): DebugSink in the middle of a chain."""

    domain = "host"

    def __init__(self, limit: int = 32, tag: str = "debug"):
        self.limit = limit
        self.tag = tag

    def apply(self, x):
        _debug_print(x, self.limit, self.tag)
        return x


class PduVectorSink(Block):
    """Collects PDUs; the PDU-domain test sink (reference uses
    NCReadStream::pop loops in tests, e.g. src/hasher.rs:80-85)."""

    n_out = 0
    domain = "host"

    def __init__(self):
        self._pdus = []

    def apply(self, pdus):
        self._pdus.extend(pdus)
        return ()

    def pdus(self):
        return list(self._pdus)


class PduFileSink(Block):
    """Append every PDU's bytes to one file (reference src/file_sink.rs
    NoCopyFileSink :207)."""

    n_out = 0
    domain = "host"

    def __init__(self, path: str, mode: str = "overwrite"):
        modes = {"create": "xb", "overwrite": "wb", "append": "ab"}
        self._f = open(path, modes[mode])

    def apply(self, pdus):
        for p in pdus:
            self._f.write(np.asarray(p.data, np.uint8).tobytes())
        self._f.flush()
        return ()

    def finish(self):
        self._f.close()
