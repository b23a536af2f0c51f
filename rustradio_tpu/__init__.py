"""rustradio_tpu — a TPU-native software-defined-radio framework.

A from-scratch JAX/XLA/Pallas re-imagining of the capability set of
`rustradio <https://github.com/ThomasHabets/rustradio>`_ (reference mounted at
/root/reference).  Where the reference runs a dynamic block scheduler over
mmap'd circular buffers (graph.rs, mtgraph.rs, circular_buffer.rs), this
framework compiles a whole flowgraph into jitted programs over fixed-size
sample chunks, carrying all per-block state (filter tails, oscillator phases,
LFSR registers, clock-recovery state) in a pytree scanned with ``lax.scan``.

Layout:

* :mod:`rustradio_tpu.dtypes` — sample types, parsing helpers
* :mod:`rustradio_tpu.windows`, :mod:`rustradio_tpu.taps` — filter design
* :mod:`rustradio_tpu.ops` — pure stream kernels (the DSP math)
* :mod:`rustradio_tpu.blocks` — stateful block wrappers for graphs
* :mod:`rustradio_tpu.graph` — flowgraph builder + compilers
* :mod:`rustradio_tpu.parallel` — mesh / time-shard / channel-shard layer
* :mod:`rustradio_tpu.io` — file formats and host I/O (au, SigMF, ...)
* :mod:`rustradio_tpu.models` — full receiver chains (AX.25, FM, ...)
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compiles across processes (first TPU compile of a CLI
    app otherwise costs tens of seconds on every invocation).  Opt out
    with RUSTRADIO_TPU_NO_CACHE=1."""
    if _os.environ.get("RUSTRADIO_TPU_NO_CACHE"):
        return

    # CPU AOT results are machine-feature-specific; caching them across
    # hosts risks SIGILL.  The cache is for the TPU paths — skip only when
    # CPU is the PRIMARY platform.  (A bare substring test is wrong: this
    # image's sitecustomize sets jax_platforms to "axon,cpu" — axon first,
    # cpu fallback — and matching "cpu" there silently disabled the cache
    # for every TPU run until round 3.)
    def _primary_is_cpu(spec: str | None) -> bool:
        plats = [p.strip() for p in (spec or "").split(",") if p.strip()]
        return bool(plats) and plats[0] == "cpu"

    if _primary_is_cpu(_os.environ.get("JAX_PLATFORMS")):
        return
    try:
        import jax

        if _primary_is_cpu(jax.config.jax_platforms):
            return
    except Exception:
        return
    try:
        import jax

        path = _os.environ.get(
            "RUSTRADIO_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "rustradio_tpu_xla"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort
        pass


_enable_compilation_cache()

from . import dtypes, taps, windows
from .dtypes import Complex, Float, parse_frequency, parse_verbosity
from .graph import CancellationToken, Graph
from .streams import Pdu, StreamValue, Tag

__version__ = "0.1.0"

__all__ = [
    "CancellationToken",
    "Complex",
    "Float",
    "Graph",
    "Pdu",
    "StreamValue",
    "Tag",
    "dtypes",
    "parse_frequency",
    "parse_verbosity",
    "taps",
    "windows",
]
