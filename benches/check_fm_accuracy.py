#!/usr/bin/env python3
"""On-device accuracy check for pallas_fm_chain's precision modes.

Generates 8-bit wire-grid I/Q on the HOST (so the float64 reference is
computed from the exact same values), stages the f32 planes to the
device, runs the fused kernel at each precision, and prints one JSON
line per mode with the max |error| in radians vs the float64 model.

The 1e-3 rad parity budget (PARITY.md) is the pass bar; "w2"/"split3"
are expected to exceed it (documented trade-offs).

Run on TPU:  python benches/check_fm_accuracy.py
On CPU the kernel dispatch falls back to pallas_fir_decimate +
fast_atan2, so CPU numbers check the fallback, not Mosaic codegen.
"""
from __future__ import annotations

import json
import os
import sys

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustradio_tpu import ops
from rustradio_tpu import taps as tg


def _fir_deci_f64(x, taps, deci):
    n = len(x)
    m = -(-n // deci)
    acc = np.zeros(m, np.float64)
    xp = np.concatenate([np.zeros(len(taps) - 1), x.astype(np.float64)])
    for j, t in enumerate(np.asarray(taps, np.float64)):
        acc += xp[len(taps) - 1 - j : len(taps) - 1 - j + n : deci][:m] * t
    return acc


def fm_chain_f64(xr, xi, taps, deci, gain):
    yr = _fir_deci_f64(xr, taps, deci)
    yi = _fir_deci_f64(xi, taps, deci)
    y = yr + 1j * yi
    d = np.conj(y[:-1]) * y[1:]
    return gain * np.arctan2(d.imag, d.real)


def main() -> None:
    deci = 4
    n = 1 << 18
    rng = np.random.RandomState(7)
    # 8-bit wire grid — exactly representable in bf16 AND s8
    a = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    b = (rng.randint(0, 256, n).astype(np.float32) - 127.0) / 128.0
    lp = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)

    want = fm_chain_f64(a, b, lp, deci, 1.0)
    da, db = jnp.asarray(a), jnp.asarray(b)

    run = jax.jit(
        lambda xa, xb, p=None: ops.pallas_fm_chain(xa, xb, lp, deci, 1.0,
                                                   precision=p),
        static_argnames=("p",),
    )
    for prec in ("highest", "w3", "i8", "w2", "split3"):
        got = np.asarray(run(da, db, p=prec))
        err = float(np.max(np.abs(got - want)))
        print(json.dumps({
            "precision": prec,
            "max_err_rad": round(err, 8),
            "within_1e3_budget": bool(err <= 1e-3),
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
