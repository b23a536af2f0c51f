#!/usr/bin/env python3
"""Per-kernel microbenchmark suite (reference analog:
benches/bench_rustradio.rs:72-125 criterion benches).

Each bench prints one JSON line {"bench": ..., "msps": ..., ...}.  Run
all with no args, or name benches:

    python benches/bench_kernels.py [fm_chain fir fft_filter quad_demod
                                     channelizer decode_bank scan_stream]

Timing method (doc/performance.md "Measuring on the axon TPU tunnel"):
loop >=64 iterations inside ONE jit with per-iteration input variation,
time the DIFFERENCE of two loop lengths, take the median of 5.  On CPU
the loops shrink so the suite stays runnable in CI (numbers are then
only regression-relative, not roofline-relevant).
"""
from __future__ import annotations

import json
import os
import sys
import time

def _setup_platform() -> None:
    """--cpu forces CPU; otherwise probe device init in a SUBPROCESS —
    a dead axon tunnel blocks jax.devices() in-process forever (same
    guard as bench.py).  Called from __main__ only, BEFORE any backend
    init, so importing this module (bench.py borrows timed_loop) never
    spawns a probe."""
    import jax

    if "--cpu" in sys.argv or "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
        return
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=150, capture_output=True, text=True,
        )
        ok = r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        ok = False
    if not ok:
        jax.config.update("jax_platforms", "cpu")


import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustradio_tpu import ops
from rustradio_tpu import taps as tg


def on_tpu() -> bool:
    return jax.devices()[0].platform != "cpu"


def timed_loop(make_body, n_samples, iters=None, reps=5):
    """Median per-iteration Msamples/s of make_body(key, s) via dual-length
    differencing inside one jit."""
    if iters is None:
        iters = 128 if on_tpu() else 2

    @jax.jit
    def loop(key, scales):
        carry0, body = make_body(key)

        def body_fn(carry, s):
            return carry + body(s), ()

        total, _ = jax.lax.scan(body_fn, carry0, scales)
        return total

    key = jax.random.key(0)
    half = jnp.linspace(0.0, 0.001, iters).astype(jnp.float32)
    full = jnp.linspace(0.0, 0.001, 2 * iters).astype(jnp.float32)
    float(loop(key, half))
    float(loop(key, full))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(key, half))
        th = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(key, full))
        tf = time.perf_counter() - t0
        samples.append(n_samples / max((tf - th) / iters, 1e-9) / 1e6)
    return sorted(samples)[len(samples) // 2]


def emit(**kw):
    # platform label distinguishes a CPU-fallback row (dead tunnel /
    # --cpu) from a real TPU measurement in the JSONL history
    kw.setdefault("platform", jax.devices()[0].platform)
    print(json.dumps(kw), flush=True)


# ---------------------------------------------------------------- benches

def bench_fm_chain():
    """The fused FM chain from KERNEL-RESIDENT packed planes — the
    steady-state format a receiver's ingest pass writes (fm_plane_pack;
    the u8 normalize touches every sample anyway, so writing the packed
    layout is free).  The pack pass itself is the fm_ingest_pack row.
    Packing happens once per timed program (outside the scan body), so
    the per-iteration rate is the chain itself, matching the 5 B/sample
    HBM model in doc/performance.md."""
    n = 1 << 24 if on_tpu() else 1 << 18
    deci = 4
    lp = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)
    for prec in ("w3", "i8", "highest", "split3", "w2"):
        def make(key, _p=prec):
            a, b = jax.random.normal(key, (2, n), jnp.float32)
            a = jnp.round(jnp.clip(a * 38, -128, 127)) * jnp.float32(1 / 128)
            b = jnp.round(jnp.clip(b * 38, -128, 127)) * jnp.float32(1 / 128)
            pa = ops.fm_plane_pack(a, lp, deci, precision=_p)
            pb = ops.fm_plane_pack(b, lp, deci, precision=_p)

            def body(s):
                return jnp.sum(ops.pallas_fm_chain(pa, pb, lp, deci, 1.0,
                                                   offset=s, precision=_p,
                                                   n=n))

            return jnp.float32(0.0), body

        emit(bench=f"fm_chain/{prec}", msps=round(timed_loop(make, n), 1),
             n=n, deci=deci, ntaps=len(lp))

    # the ingest pass: flat wire-grid f32 plane -> packed bf16 plane
    def make_pack(key):
        a = jax.random.normal(key, (n,), jnp.float32)
        a = jnp.round(jnp.clip(a * 38, -128, 127)) * jnp.float32(1 / 128)

        def body(s):
            p = ops.fm_plane_pack(a + s, lp, deci, precision="w3")
            return jnp.sum(p[-1].astype(jnp.float32))

        return jnp.float32(0.0), body

    emit(bench="fm_ingest_pack", msps=round(timed_loop(make_pack, n), 1), n=n)


def bench_fir():
    n = 1 << 23 if on_tpu() else 1 << 18
    for deci, ntaps in [(1, 49), (4, 49), (1, 1205), (4, 1205)]:
        taps = np.real(np.asarray(
            tg.low_pass_complex(1_024_000.0, 400_000.0 / deci, 50_000.0,
                                "hamming"))).astype(np.float32)
        taps = np.resize(taps, ntaps).astype(np.float32) / ntaps

        def make(key, _t=taps, _d=deci):
            x = jax.random.normal(key, (n,), jnp.float32)

            def body(s):
                from rustradio_tpu.ops.pallas_kernels import pallas_fir_decimate
                return jnp.sum(pallas_fir_decimate(x + s, _t, _d))

            return jnp.float32(0.0), body

        emit(bench=f"fir_banded/deci{deci}_taps{ntaps}",
             msps=round(timed_loop(make, n), 1), n=n)


def bench_fft_filter():
    n = 1 << 23 if on_tpu() else 1 << 18
    lp = np.asarray(tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0,
                                        "hamming"))

    def make(key):
        a, b = jax.random.normal(key, (2, n), jnp.float32)

        def body(s):
            from rustradio_tpu.ops.fft_filter import fft_filter_decimate
            y = fft_filter_decimate(jax.lax.complex(a + s, b), lp, 4,
                                    fft_size=8192)
            return jnp.sum(jnp.real(y))

        return jnp.float32(0.0), body

    emit(bench="fft_filter_decimate", msps=round(timed_loop(make, n), 1), n=n)


def bench_quad_demod():
    n = 1 << 23 if on_tpu() else 1 << 18

    def make(key):
        a, b = jax.random.normal(key, (2, n), jnp.float32)

        def body(s):
            from rustradio_tpu.ops.pallas_kernels import pallas_quad_demod
            return jnp.sum(pallas_quad_demod(jax.lax.complex(a + s, b), 1.0))

        return jnp.float32(0.0), body

    emit(bench="quad_demod", msps=round(timed_loop(make, n), 1), n=n)


def bench_channelizer():
    from rustradio_tpu.parallel.channelizer import channelizer_taps, pfb_channelize

    nch = 256
    n = (1 << 22 if on_tpu() else 1 << 17)
    n -= n % nch
    taps = channelizer_taps(nch)

    def make(key):
        a, b = jax.random.normal(key, (2, n), jnp.float32)

        def body(s):
            ch = pfb_channelize(jax.lax.complex(a + s, b), taps, nch)
            return jnp.sum(jnp.abs(ch) ** 2)

        return jnp.float32(0.0), body

    emit(bench=f"channelizer/{nch}ch", msps=round(timed_loop(make, n), 1), n=n)


def bench_bell202_frontend():
    """The full AFSK front-end (band-pass + hilbert + demod + audio LPF),
    all banded Pallas kernels on TPU."""
    from rustradio_tpu.models.ax25 import bell202_demod

    n = 1 << 22 if on_tpu() else 1 << 17
    fs = 44100.0

    def make(key):
        a = jax.random.normal(key, (n,), jnp.float32)

        def body(s):
            return jnp.sum(bell202_demod(a + s, fs))

        return jnp.float32(0.0), body

    emit(bench="bell202_frontend", msps=round(timed_loop(make, n), 1), n=n)


def bench_decode_bank():
    """Channel-parallel clock recovery: vmapped symbol_sync over a bank of
    channels (VERDICT r2 weak item 5) — the bit-exact per-sample scan vs
    the event-driven reformulation (sequential chain ~n/sps instead of n).

    Input is realistic NRZ (random bits held for sps samples + noise) so
    the events path's crossing budget reflects real decode-bank load; the
    scan's runtime is data-independent so its row stays comparable to r3's
    noise-input numbers."""
    from rustradio_tpu.models.multichannel import recover_symbols_batch

    nch = 64 if on_tpu() else 4
    per = 1 << 16 if on_tpu() else 1 << 10
    sps = 36.75
    rep = int(round(sps))
    nbits = per // rep + 1

    def make_nrz(key):
        kb, kn = jax.random.split(key)
        bits = jax.random.rademacher(kb, (nch, nbits), jnp.float32)
        nrz = jnp.repeat(bits, rep, axis=1)[:, :per]
        return nrz + 0.1 * jax.random.normal(kn, (nch, per), jnp.float32)

    # events budget: ~4x the expected crossing count for random NRZ
    budget = max(1024, 4 * per // rep)

    for method, kw in (("scan", {}), ("events", {"max_events": budget})):
        def make(key, method=method, kw=kw):
            nrz = make_nrz(key)

            def body(s):
                vals, mask, _ = recover_symbols_batch(
                    nrz + s, sps, 0.5, (0.5, 0.5), method=method, **kw)
                return jnp.sum(vals) + jnp.sum(mask)

            return jnp.float32(0.0), body

        iters = 8 if on_tpu() else 2
        if method == "events" and on_tpu():
            iters = 64
        msps = timed_loop(make, nch * per, iters=iters)
        name = "decode_bank" if method == "scan" else "decode_bank_events"
        emit(bench=f"{name}/{nch}ch", msps=round(msps, 2), nch=nch,
             per_channel_msps=round(msps / nch, 3), unroll=16)


def bench_scan_stream():
    """Compiled streaming runner vs per-chunk dispatch (Graph.run_stream
    scan_chunks) on a device FM chain."""
    from rustradio_tpu import blocks
    from rustradio_tpu.graph import Graph

    chunk = 1 << 18 if on_tpu() else 1 << 14
    n_chunks = 64 if on_tpu() else 8
    rng = np.random.RandomState(0)
    data = rng.randn(chunk * n_chunks).astype(np.float32)
    taps = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)

    def run(scan):
        g = Graph()
        sink = blocks.NullSink()
        g.chain(
            blocks.VectorSource(data),
            blocks.FirFilter(taps),
            blocks.QuadratureDemod(1.0),
            blocks.MultiplyConst(0.5),
            sink,
        )
        g.run_stream(chunk_size=chunk, scan_chunks=scan)  # warm compile
        t0 = time.perf_counter()
        g.run_stream(chunk_size=chunk, scan_chunks=scan)
        return time.perf_counter() - t0

    # whole-run timing (no in-jit loop is possible for the host-driven
    # graph); median of 5 runs rides out the tunnel's dispatch jitter
    t_per_chunk = sorted(run(None) for _ in range(5))[2]
    t_scan = sorted(run(n_chunks) for _ in range(5))[2]
    emit(bench="scan_stream", chunk=chunk, n_chunks=n_chunks,
         per_chunk_msps=round(len(data) / t_per_chunk / 1e6, 1),
         scan_msps=round(len(data) / t_scan / 1e6, 1))


def bench_scan_stream_device():
    """The compiled streaming runner with DEVICE-RESIDENT data: a source
    whose chunks are device slices and a device-domain discard sink, so
    nothing crosses the host boundary until one final scalar readback.
    This is the e2e number a real TPU host sees (the plain scan_stream
    bench is bounded by this image's ~20 MB/s host tunnel)."""
    import jax as _jax

    from rustradio_tpu import blocks
    from rustradio_tpu.blocks.base import Block, SourceBlock
    from rustradio_tpu.graph import Graph

    chunk = 1 << 20 if on_tpu() else 1 << 14
    # RR_BENCH_CHUNKS scales the stream length: the scan runner's whole
    # stream costs ONE dispatch+readback (~90 ms fixed on this tunnel),
    # so longer streams expose the chain-bound rate the runner actually
    # sustains on a standard host.
    n_chunks = (int(os.environ.get("RR_BENCH_CHUNKS", "64"))
                if on_tpu() else 8)
    taps = np.real(np.asarray(
        tg.low_pass_complex(1_024_000.0, 100_000.0, 50_000.0, "hamming"))
    ).astype(np.float32)

    class DeviceSource(SourceBlock):
        def __init__(self, n):
            key = _jax.random.key(0)
            self.buf = _jax.random.normal(key, (n,), jnp.float32)
            self._slice = _jax.jit(
                lambda b, o: _jax.lax.dynamic_slice_in_dim(b, o, chunk))
            self._slice_b = _jax.jit(
                lambda b, o, _nb: _jax.lax.dynamic_slice_in_dim(
                    b, o, _nb * chunk).reshape(_nb, chunk),
                static_argnums=2)

        def total_len(self):
            return self.buf.shape[0]

        def emit(self, offset, n):
            assert n == chunk
            return self._slice(self.buf, offset)

        def emit_batch(self, offset, chunk_size, nb):
            # ONE program for the whole stacked batch
            return self._slice_b(self.buf, offset, nb)

    class DevNullSink(Block):
        domain = "device"
        n_out = 0
        jit_chunk = False

        last = None

        def apply(self, x):
            self.last = x
            return ()

        def init_state(self):
            return None

        def apply_chunk(self, state, x):
            self.last = x
            return state, ()

        def accept_batch(self, stacked):
            self.last = stacked[-1]

    def run(scan):
        g = Graph()
        sink = DevNullSink()
        g.chain(
            DeviceSource(chunk * n_chunks),
            blocks.FirFilter(taps),
            blocks.QuadratureDemod(1.0),
            blocks.MultiplyConst(0.5),
            sink,
        )
        g.run_stream(chunk_size=chunk, scan_chunks=scan)  # warm compiles
        t0 = time.perf_counter()
        g.run_stream(chunk_size=chunk, scan_chunks=scan)
        # one readback forces the whole queued stream
        float(jnp.sum(sink.last[-8:]))
        return time.perf_counter() - t0

    n = chunk * n_chunks
    # median of 5 whole runs (CLAUDE.md: best-of-N biases upward under
    # the tunnel's 30-100 ms jitter)
    t_scan = sorted(run(n_chunks) for _ in range(5))[2]
    t_chunk = sorted(run(None) for _ in range(5))[2]
    emit(bench="scan_stream_device", chunk=chunk, n_chunks=n_chunks,
         per_chunk_msps=round(n / t_chunk / 1e6, 1),
         scan_msps=round(n / t_scan / 1e6, 1))


def bench_native():
    """Host-native sequential tail (native/rr_native.cpp): symbol sync
    and HDLC deframe rates.  Pure host timing — no device, no tunnel —
    so these rows are reproducible anywhere the .so builds."""
    from rustradio_tpu import native, ops

    if not native.available():
        emit(bench="native", error="librr_native unavailable")
        return

    rng = np.random.RandomState(0)
    sps = 36.75
    n = 1 << 22
    bits = rng.randint(0, 2, int(n / sps) + 2) * 2.0 - 1.0
    x = np.repeat(bits, int(round(sps)))[:n].astype(np.float32)
    x += rng.randn(n).astype(np.float32) * 0.1
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        native.symbol_sync_f32(x, sps, 0.5, np.asarray([0.5, 0.5]))
        ts.append(time.perf_counter() - t0)
    emit(bench="native_symbol_sync", msps=round(n / sorted(ts)[2] / 1e6, 1),
         n=n)

    # HDLC: a realistic packet stream (framed, FCS'd, stuffed)
    frames = []
    for _ in range(64):
        payload = rng.randint(0, 256, 256).astype(np.uint8)
        frames.append(np.asarray(ops.hdlc_frame(ops.fcs_add(payload))))
    stream = np.concatenate(frames * 8).astype(np.uint8)
    ts = []
    for _ in range(5):
        sm = native.HdlcDeframer(1, 1500, False, False)
        t0 = time.perf_counter()
        sm.feed(stream)
        ts.append(time.perf_counter() - t0)
    emit(bench="native_hdlc_deframe",
         mbps=round(len(stream) / sorted(ts)[2] / 1e6, 1), bits=len(stream))


BENCHES = {
    "fm_chain": bench_fm_chain,
    "native": bench_native,
    "bell202": bench_bell202_frontend,
    "fir": bench_fir,
    "fft_filter": bench_fft_filter,
    "quad_demod": bench_quad_demod,
    "channelizer": bench_channelizer,
    "decode_bank": bench_decode_bank,
    "scan_stream": bench_scan_stream,
    "scan_stream_device": bench_scan_stream_device,
}


def main(argv):
    names = argv or list(BENCHES)
    for name in names:
        BENCHES[name]()


if __name__ == "__main__":
    _setup_platform()
    main(sys.argv[1:])
