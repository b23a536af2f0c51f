#!/usr/bin/env python3
"""Scaling-efficiency harness: the time-sharded FM chain, weak-scaled.

Runs the sharded chain (parallel/sharded.py::sharded_fm_demod) on meshes of
1..N devices with a fixed per-device shard, reporting samples/s and the
efficiency vs the 1-device rate (the SURVEY north star is >=80% from one
chip to N hosts).  On real pods run it as-is; without TPU hardware use

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

(CPU-mesh numbers validate the harness and the collective layout, not the
hardware scaling — virtual CPU devices share cores.)

Timing follows bench.py / CLAUDE.md: >=64 iterations inside one jit with
per-iteration input variation, one scalar readback, and a 1-iteration
calibration run to cancel the fixed dispatch/readback overhead.

Prints one JSON line per mesh size.
"""

import json
import os
import time

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main() -> None:
    from rustradio_tpu import taps as tg
    from rustradio_tpu.parallel import make_mesh, sharded_fm_demod

    lp = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming")
    deci = 4
    shard = 1 << 20  # samples per device
    ndev = len(jax.devices())
    on_tpu = jax.devices()[0].platform != "cpu"
    iters = 64 if on_tpu else 8
    base_rate = None
    for n_sh in [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]:
        mesh = make_mesh(n_sh)
        n = n_sh * shard

        @jax.jit
        def loop(key, scales):
            a, b = jax.random.normal(key, (2, n), jnp.float32)
            x = jax.lax.complex(a, b)
            x = jax.device_put(
                x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("time"))
            )

            def body(c, s):
                y = sharded_fm_demod(x * s, taps=lp, mesh=mesh, deci=deci, gain=1.0)
                return c + y[-1] + y[y.shape[0] // 2], None

            c, _ = jax.lax.scan(body, jnp.float32(0), scales)
            return c

        key = jax.random.PRNGKey(0)
        # dual-length differencing, median of 5 (the CLAUDE.md tunnel rule:
        # 1-iter calibration is unstable under dispatch jitter)
        half = jnp.linspace(1.0, 1.001, iters)
        full = jnp.linspace(1.0, 1.001, 2 * iters)
        float(loop(key, half))
        float(loop(key, full))
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(key, half))
            th = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(key, full))
            tf = time.perf_counter() - t0
            diffs.append(max((tf - th) / iters, 1e-9))
        dt = sorted(diffs)[len(diffs) // 2]
        rate = n / dt / 1e6
        if base_rate is None:
            base_rate = rate
        ntaps = len(lp)
        # halo traffic: one left halo of (ntaps-1) complex64 for the filter
        # + 1 for the demod, per shard boundary, per stream step
        halo_bytes = (ntaps - 1 + 1) * 8
        print(
            json.dumps(
                {
                    "metric": "sharded_fm_demod_weak_scaling",
                    "devices": n_sh,
                    "value": round(rate, 1),
                    "unit": "Msamples/s",
                    "efficiency_vs_1dev": round(rate / (base_rate * n_sh), 3),
                    "halo_bytes_per_shard_step": halo_bytes,
                    "halo_bytes_per_sample": round(halo_bytes / shard, 8),
                }
            )
        )


def halo_fraction() -> None:
    """Measure the collective/boundary overhead directly: the full sharded
    chain vs a local-only variant (halo exchange replaced by zero padding —
    identical per-shard FLOPs and memory, NO ppermute).  Their time
    difference bounds the communication fraction on this mesh."""
    from rustradio_tpu import taps as tg
    from rustradio_tpu.parallel import make_mesh, sharded_fm_demod
    from rustradio_tpu.parallel.sharded import _shmap

    lp = tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming")
    ntaps = len(lp)
    deci = 4
    shard = 1 << 20
    ndev = len(jax.devices())
    n_sh = min(8, ndev)
    mesh = make_mesh(n_sh)
    n = n_sh * shard
    on_tpu = jax.devices()[0].platform != "cpu"
    iters = 64 if on_tpu else 8

    from rustradio_tpu.ops.fft_filter import fft_filter_decimate
    from rustradio_tpu.ops.demod import quadrature_demod

    def local_body(xs):
        # same compute shape as sharded_fm_demod's body, halo = zeros
        # (WRONG at shard boundaries — timing-only control)
        ext = jnp.concatenate([jnp.zeros(ntaps - 1, xs.dtype), xs])
        y = fft_filter_decimate(ext, lp, deci)[(ntaps - 1) // deci:]
        y = y[: xs.shape[0] // deci]
        ext2 = jnp.concatenate([jnp.zeros(1, y.dtype), y])
        return quadrature_demod(ext2, 1.0)

    def timed(fn_builder):
        @jax.jit
        def loop(key, scales):
            a, b = jax.random.normal(key, (2, n), jnp.float32)
            x = jax.lax.complex(a, b)
            x = jax.device_put(
                x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("time"))
            )

            def body(c, s):
                y = fn_builder(x * s)
                return c + y[-1] + y[y.shape[0] // 2], None

            c, _ = jax.lax.scan(body, jnp.float32(0), scales)
            return c

        key = jax.random.PRNGKey(0)
        half = jnp.linspace(1.0, 1.001, iters)
        full = jnp.linspace(1.0, 1.001, 2 * iters)
        float(loop(key, half))
        float(loop(key, full))
        diffs = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(key, half))
            th = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(key, full))
            tf = time.perf_counter() - t0
            diffs.append(max((tf - th) / iters, 1e-9))
        return sorted(diffs)[len(diffs) // 2]

    t_halo = timed(
        lambda x: sharded_fm_demod(x, taps=lp, mesh=mesh, deci=deci, gain=1.0)
    )
    t_local = timed(lambda x: _shmap(mesh, "time", local_body)(x))
    frac = (t_halo - t_local) / t_halo
    print(
        json.dumps(
            {
                "metric": "halo_collective_fraction",
                "devices": n_sh,
                "t_with_halo_s": round(t_halo, 6),
                "t_local_only_s": round(t_local, 6),
                "fraction": round(frac, 4),
                "halo_bytes_per_shard_step": (ntaps - 1 + 1) * 8,
            }
        )
    )


if __name__ == "__main__":
    main()
    halo_fraction()
