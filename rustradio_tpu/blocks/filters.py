"""Filter blocks with exact streaming state carry."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import ops
from .. import taps as tapgen
from ..streams import Tag
from .base import Block


def _kernel_group(ntaps: int) -> str | None:
    """Fusion flavor on TPU: filters on the banded Pallas path are
    "pallas", longer ones lower to HIGHEST XLA convs ("conv") — the two
    must not share a fused program (see Block.compile_group).

    Called lazily (compile_group properties), never at block
    construction: _on_tpu() touches jax.devices(), and initializing the
    backend as a side effect of building a graph would defeat a later
    jax.config.update("jax_platforms", ...)."""
    from ..ops.pallas_kernels import _on_tpu

    if not _on_tpu():
        return None
    return "pallas" if ntaps <= 4096 else "conv"


class FirFilter(Block):
    """Decimating FIR, valid-conv alignment (reference src/fir.rs:485-547).

    Streaming: carries unconsumed raw input so chunked == offline exactly.
    Optional fused frequency translation (reference src/fir.rs:413-483).
    """

    def __init__(self, taps, deci: int = 1, translate: tuple[float, float] | None = None):
        self.taps = np.asarray(taps)
        self.deci = deci
        self.translate = translate

    @property
    def compile_group(self):
        return _kernel_group(len(self.taps))

    def apply(self, x):
        if self.translate is not None:
            sr, fq = self.translate
            return ops.fir_filter_translating(x, self.taps, sr, fq, self.deci)
        return ops.fir_filter(x, self.taps, self.deci)

    def init_state(self):
        return {"buf": np.zeros(0, self.taps.dtype), "out_off": 0}

    def apply_chunk(self, state, x):
        ntaps = len(self.taps)
        buf = jnp.concatenate(
            [jnp.asarray(state["buf"], jnp.asarray(x).dtype), jnp.asarray(x)]
        )
        n_avail = buf.shape[0]
        out_off = state["out_off"]
        if n_avail < ntaps:
            return {"buf": buf, "out_off": out_off}, jnp.zeros(0, buf.dtype)
        n_out = (n_avail - ntaps) // self.deci + 1
        consumed = n_out * self.deci
        if self.translate is not None:
            sr, fq = self.translate
            y = ops.fir_filter_translating(buf, self.taps, sr, fq, self.deci)
            # fix rotator phase for the global output offset
            step = -2.0 * np.pi * fq / sr * self.deci
            y = y * jnp.exp(1j * jnp.float32(step * out_off)).astype(y.dtype)
        else:
            y = ops.fir_filter(buf, self.taps, self.deci)
        return {"buf": buf[consumed:], "out_off": out_off + int(n_out)}, y


class FftFilter(Block):
    """Fast-convolution filter, full-conv alignment
    (reference src/fft_filter.rs:289-354)."""

    def __init__(self, taps, fft_size: int | None = None):
        self.taps = np.asarray(taps)
        self.fft_size = fft_size
        real = not np.iscomplexobj(self.taps) or not np.any(np.imag(self.taps))
        self._real_taps = real

    @property
    def compile_group(self):
        return _kernel_group(len(self.taps)) if self._real_taps else None

    def apply(self, x):
        return ops.filter_complex(x, self.taps, self.fft_size)

    def init_state(self):
        return jnp.zeros(len(self.taps) - 1, jnp.complex64)

    def apply_chunk(self, state, x):
        ntaps = len(self.taps)
        ext = jnp.concatenate([jnp.asarray(state, jnp.complex64), jnp.asarray(x, jnp.complex64)])
        y = ops.filter_complex(ext, self.taps, self.fft_size)[ntaps - 1 :]
        return ext[-(ntaps - 1) :], y


class FftFilterFloat(Block):
    """Float fast-convolution (reference src/fft_filter.rs:357-491)."""

    def __init__(self, taps, fft_size: int | None = None):
        self.taps = np.asarray(taps, np.float32)
        self.fft_size = fft_size

    @property
    def compile_group(self):
        return _kernel_group(len(self.taps))

    def apply(self, x):
        return ops.filter_float(x, self.taps, self.fft_size)

    def init_state(self):
        return jnp.zeros(len(self.taps) - 1, jnp.float32)

    def apply_chunk(self, state, x):
        ntaps = len(self.taps)
        ext = jnp.concatenate([jnp.asarray(state, jnp.float32), jnp.asarray(x, jnp.float32)])
        y = ops.filter_float(ext, self.taps, self.fft_size)[ntaps - 1 :]
        return ext[-(ntaps - 1) :], y


class Hilbert(Block):
    """Hilbert transformer (reference src/hilbert.rs:68-125)."""

    def __init__(self, ntaps: int = 65, window: str = "hamming"):
        if ntaps % 2 != 1:
            raise ValueError("hilbert filter len must be odd")
        self.ntaps = ntaps
        self.taps = tapgen.hilbert(ntaps, window)

    @property
    def compile_group(self):
        return _kernel_group(self.ntaps)

    def apply(self, x):
        return ops.hilbert_transform(x, self.ntaps, taps=self.taps)

    def init_state(self):
        return jnp.zeros(self.ntaps, jnp.float32)

    def apply_chunk(self, state, x):
        x = jnp.asarray(x, jnp.float32)
        ext = jnp.concatenate([state, x])
        n = x.shape[0]
        from ..ops.fir import _conv1d
        import jax

        y_im = _conv1d(ext, self.taps, stride=1, pad_left=0)[:n]
        d = self.ntaps - self.ntaps // 2
        y_re = ext[self.ntaps - d : self.ntaps - d + n]
        return ext[-self.ntaps :], jax.lax.complex(y_re, y_im)


class SinglePoleIirFilter(Block):
    """y += alpha (x - y) (reference src/single_pole_iir_filter.rs)."""

    def __init__(self, alpha: float):
        if not 0.0 <= alpha <= 1.0:
            raise ValueError("alpha out of range")
        self.alpha = alpha

    def apply(self, x):
        return ops.single_pole_iir(x, self.alpha)

    def init_state(self):
        return None  # y0 carried lazily (dtype depends on stream)

    def apply_chunk(self, state, x):
        y = ops.single_pole_iir(x, self.alpha, y0=state)
        return y[-1], y


class IqBalance(Block):
    """DC offset removal: out = x - running_mean(x)
    (reference src/iq_balance.rs:50-78: mean = mean*(1-a) + x*a, out = x - mean)."""

    def __init__(self, alpha: float | None = None, sample_rate: float | None = None, tau: float = 0.2):
        if alpha is None:
            if sample_rate is None:
                raise ValueError("need alpha or sample_rate")
            alpha = float(np.clip(1.0 - np.exp(-1.0 / (tau * sample_rate)), 0.0, 1.0))
        self.alpha = float(np.clip(alpha, 0.0, 1.0))

    def apply(self, x):
        x = jnp.asarray(x)
        return x - ops.single_pole_iir(x, self.alpha)

    def init_state(self):
        return None

    def apply_chunk(self, state, x):
        x = jnp.asarray(x)
        m = ops.single_pole_iir(x, self.alpha, y0=state)
        return m[-1], x - m
