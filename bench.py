#!/usr/bin/env python3
"""Headline benchmark: FM-demod chain throughput on the available device.

Chain: overlap-save FFT low-pass (low_pass(1.024 MHz, 100 kHz, 50 kHz) —
the reference's own micro-benchmark filter, benches/bench_rustradio.rs:
72-125) + decimate-by-4 + quadrature demod, fused in one jit program.

Baseline: the reference publishes one full-chain wall-time figure —
ax25-1200-rx over WA8LMF CD track 1 (44.1 kHz * ~30 min = 79.4 Msamples) in
0.929 s multithreaded with 40 MB buffers (reference src/stream.rs:100-104),
i.e. ~85.4 Msamples/s for its full receive chain on the author's x86 box.
``vs_baseline`` is measured Msamples/s divided by that 85.4.

Timing notes: on this image's axon TPU tunnel ``block_until_ready`` does
not synchronize with device execution, so the benchmark loops *inside* one
jit (a lax.scan whose carry depends on every iteration's full output) and
synchronizes once with a scalar readback (~25 ms steady-state, subtracted
via calibration).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MSPS = 85.4  # reference ax25-1200-rx: 79.4 Msamples / 0.929 s


def main() -> None:
    from rustradio_tpu import taps as tg
    from rustradio_tpu import ops

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n = 1 << 24 if on_tpu else 1 << 20
    iters = 64 if on_tpu else 2
    deci = 4

    lp = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming")

    from rustradio_tpu.ops.fft_filter import fft_filter_decimate

    def chain(x):
        if on_tpu:
            # banded MXU FIR (ops/pallas_kernels.py): ~3.2x the overlap-save
            # FFT path at this tap count, bf16x3 precision (err ~3e-7)
            y = ops.pallas_fir_decimate(x, lp, deci)
        else:
            y = fft_filter_decimate(x, lp, deci, fft_size=8192)
        return ops.quadrature_demod(y, 1.0)

    @jax.jit
    def bench_loop(key, scales):
        # Input is generated on device (the axon tunnel cannot transfer
        # complex64 host->device).  Each iteration rescales the input
        # (prevents loop-invariant hoisting) and folds the full output into
        # the carry (prevents DCE).
        a, b = jax.random.normal(key, (2, n), jnp.float32)
        x = jax.lax.complex(a, b)

        def body(carry, s):
            # additive variation: the chain is linear+scale-invariant, so a
            # multiplicative scale could be hoisted out of the loop by XLA.
            y = chain(x + jax.lax.complex(s, s))
            return carry + jnp.sum(y), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.0), scales)
        return total

    key = jax.random.key(0)
    scales = jnp.linspace(0.0, 0.001, iters).astype(jnp.float32)

    # Warmup: compile both programs and the transfer path.
    float(bench_loop(key, scales[:1]))
    float(bench_loop(key, scales))

    # Calibrate the fixed sync overhead with the 1-iteration program.
    t0 = time.perf_counter()
    float(bench_loop(key, scales[:1]))
    t_one = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(bench_loop(key, scales))
    t_full = time.perf_counter() - t0

    # t_full = overhead + iters*t_c;  t_one = overhead + t_c
    t_c = max((t_full - t_one) / (iters - 1), 1e-9)
    msps = n / t_c / 1e6
    print(
        json.dumps(
            {
                "metric": "fm_demod_chain_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / BASELINE_MSPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
