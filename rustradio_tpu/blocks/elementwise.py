"""Elementwise and utility blocks."""

from __future__ import annotations

import numpy as np

from .. import ops
from ..streams import Tag
from .base import Block


class AddConst(Block):
    shard_halo = 0  # elementwise: time-shardable with no halo

    def __init__(self, val):
        self.val = val

    def apply(self, x):
        return ops.add_const(x, self.val)


class MultiplyConst(Block):
    shard_halo = 0

    def __init__(self, val):
        self.val = val

    def apply(self, x):
        return ops.multiply_const(x, self.val)


class XorConst(Block):
    shard_halo = 0

    def __init__(self, val):
        self.val = val

    def apply(self, x):
        return ops.xor_const(x, self.val)


class Add(Block):
    n_in = 2
    shard_halo = 0  # elementwise combiner (mesh: inputs must share rate)

    def apply(self, a, b):
        return ops.add(a, b)


class Xor(Block):
    n_in = 2
    shard_halo = 0

    def apply(self, a, b):
        return ops.xor(a, b)


class Map(Block):
    """1:1 lambda block (reference src/convert.rs:121-172).

    ``elementwise=True`` declares the lambda pointwise (no cross-sample
    deps), letting mesh runs shard it with no halo.
    """

    def __init__(self, fn, name: str = "Map", elementwise: bool = False):
        self.fn = fn
        self._name = name
        if elementwise:
            self.shard_halo = 0

    def name(self):
        return self._name

    def apply(self, x):
        return self.fn(x)


class Inspect(Block):
    """Pass-through that calls a host lambda on the data
    (reference src/convert.rs:25-50)."""

    domain = "host"

    def __init__(self, fn, name: str = "Inspect"):
        self.fn = fn
        self._name = name

    def name(self):
        return self._name

    def apply(self, x):
        self.fn(np.asarray(x))
        return x


class Tee(Block):
    """1 -> 2 copy with tags on both (reference src/tee.rs)."""

    n_out = 2
    shard_halo = 0

    def apply(self, x):
        return x, x

    def process_tags(self, in_tags, out_lens):
        src = in_tags[0] if in_tags else []
        return [list(src), list(src)]


class FloatToComplex(Block):
    n_in = 2
    shard_halo = 0

    def apply(self, re, im):
        return ops.float_to_complex(re, im)


class ComplexToFloat(Block):
    """complex -> (re, im) streams (reference src/convert.rs:290)."""

    n_out = 2
    shard_halo = 0

    def apply(self, x):
        return ops.complex_to_float(x)


class ComplexToReal(Block):
    shard_halo = 0

    def apply(self, x):
        return ops.complex_to_real(x)


class ComplexToMag2(Block):
    shard_halo = 0

    def apply(self, x):
        return ops.complex_to_mag2(x)


class BinarySlicer(Block):
    shard_halo = 0

    def apply(self, x):
        return ops.binary_slicer(x)


class PduMap(Block):
    """PDU lambda block, one PDU in -> zero-or-more PDUs out
    (reference src/convert.rs NCMap :202)."""

    domain = "host"

    def __init__(self, fn, name: str = "PduMap"):
        self.fn = fn
        self._name = name

    def name(self):
        return self._name

    def apply(self, pdus):
        out = []
        for p in pdus:
            r = self.fn(p)
            if r is None:
                continue
            out.extend(r if isinstance(r, (list, tuple)) else [r])
        return out
