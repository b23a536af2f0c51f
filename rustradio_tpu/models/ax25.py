"""AX.25 receivers: 1200 bd Bell 202 AFSK and 9600 bd G3RUH.

Mirrors the reference's flagship apps:

* ``ax25_1200_rx`` — examples/ax25-1200-rx.rs:229-315: Hilbert(65, Hamming)
  -> QuadratureDemod(1.0) -> FftFilterFloat(low_pass(fs, 1100, 100)) ->
  add_const(-2*pi*1700/fs) -> SymbolSync(fs/1200, 0.5, taps [0.5, 0.5]) ->
  BinarySlicer -> NrziDecode -> HdlcDeframer(10, 1500).
* ``ax25_9600_wpcr_rx`` — examples/ax25-9600-wpcr.rs:93-142: FftFilter
  (low_pass 20k) -> RationalResampler(->50k) -> power-gated burst capture ->
  Midpointer -> WPCR -> BinarySlicer -> NrziDecode -> Descrambler(G3RUH) ->
  HdlcDeframer(10, 1500).

The dense front-end (filters, demod) runs on device in one jitted program;
symbol sync is a device scan; HDLC framing runs on host over the recovered
bit array.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import taps as tapgen
from .. import ops
from ..dtypes import read_iq, stage_iq


@dataclasses.dataclass
class Ax25Packet:
    """One decoded AX.25 frame.

    CRC checked and stripped, unless decoded with ``keep_checksum=True``
    (structural recovery) — then ``data`` keeps the 2 unverified CRC bytes.
    """

    data: np.ndarray  # payload bytes, CRC stripped
    bit_pos: int  # bit-stream position of the frame end

    def __bytes__(self) -> bytes:
        return bytes(self.data)

    @property
    def addresses(self):
        return parse_ax25(self.data)[0]

    @property
    def info(self):
        return parse_ax25(self.data)[1]


def parse_ax25(frame: np.ndarray):
    """Minimal AX.25 UI-frame parse: (dest, src via callsigns), info bytes."""
    frame = np.asarray(frame, np.uint8)
    if len(frame) < 16:
        return [], b""
    addrs = []
    i = 0
    while i + 7 <= len(frame):
        chunk = frame[i : i + 7]
        call = "".join(chr(c >> 1) for c in chunk[:6]).strip()
        ssid = (chunk[6] >> 1) & 0xF
        addrs.append(f"{call}-{ssid}" if ssid else call)
        last = chunk[6] & 1
        i += 7
        if last:
            break
    info = bytes(frame[i + 2 :]) if i + 2 <= len(frame) else b""
    return addrs, info


@functools.partial(jax.jit, static_argnames=("samp_rate", "band"))
def bell202_demod(audio, samp_rate: float, band: tuple | None = (400.0, 2700.0)):
    """Dense device part of the Bell-202 AFSK demod: audio -> NRZ floats.

    Band-pass -> Hilbert -> quad demod -> 1100 Hz low-pass ->
    centre-frequency offset (reference chain:
    examples/ax25-1200-rx.rs:229-247, which has NO input band-pass).

    The 400-2700 Hz input band-pass is this framework's addition: the
    AFSK tones live in 1200-2200 Hz while channel noise is broadband, and
    limiting the band BEFORE the phase derivative lifted the decode-rate
    corpus from 647/1000 to 1000/1000 (tests/test_decode_rate.py; swept
    in round 3).  ``band=None`` restores the reference-faithful chain.
    """
    if band is not None:
        bp = tapgen.band_pass(samp_rate, band[0], band[1], 65, "hamming")
        audio = ops.filter_float(audio, bp)
    # band=None is the reference-faithful chain, including its 100 Hz
    # transition width; the swept configuration widened it to 200 Hz
    # (half the taps, same decode rate)
    lp = tapgen.low_pass(samp_rate, 1100.0, 200.0 if band is not None else 100.0,
                         "hamming")
    center = 1700.0  # (1200 + 2200) / 2
    analytic = ops.hilbert_transform(audio, 65, "hamming")
    fm = ops.quadrature_demod(analytic, 1.0)
    filt = ops.filter_float(fm, lp)
    return ops.add_const(filt, -jnp.float32(2.0 * np.pi * center / samp_rate))


@functools.partial(jax.jit, static_argnames=("samp_rate",))
def bell202_tone_demod(audio, samp_rate: float):
    """Dual-tone correlator AFSK demod: audio -> NRZ floats.

    Mixes the audio against both Bell-202 tones and compares windowed
    energies (window = one symbol period).  More noise-robust than the
    discriminator chain — it recovers the damaged KOESTW-15 beacon in the
    reference's own testdata/aprs.au structurally, which the reference's
    discriminator front-end cannot (no reference equivalent).
    """
    import math

    fs = float(samp_rate)
    n32 = jnp.arange(audio.shape[0], dtype=jnp.int32)
    w = int(fs / 1200.0)
    k = np.ones(w, np.float32) / w

    def tone_energy(f):
        # Reduce the phase index modulo the tone's sample period so f32
        # phase stays small — a raw f32 c*arange(n) loses ~0.5 rad past a
        # few-minute capture and turns the mixer into staircase noise.
        if fs == int(fs) and f == int(f):
            period = int(fs) // math.gcd(int(f), int(fs))
            idx = (n32 % period).astype(jnp.float32)
        else:
            idx = n32.astype(jnp.float32)
        ph = jnp.float32(2.0 * np.pi * f / fs) * idx
        re = audio * jnp.cos(ph)
        im = audio * -jnp.sin(ph)
        # centered moving average == np.convolve(..., 'same')
        pad = (len(k) - 1) // 2
        er = ops.fir_filter_full(jnp.pad(re, (0, pad)), k)[pad:]
        ei = ops.fir_filter_full(jnp.pad(im, (0, pad)), k)[pad:]
        return er * er + ei * ei

    e_mark = tone_energy(1200.0)
    e_space = tone_energy(2200.0)
    return (e_space - e_mark) / (e_space + e_mark + jnp.float32(1e-9))


def ax25_1200_rx(
    audio,
    samp_rate: float,
    fix_bits: bool = False,
    symbol_taps=(1 / 6,) * 6,
    symbol_max_deviation: float = 0.5,
    demod: str = "discriminator",
    keep_checksum: bool = False,
    band: tuple | None = (400.0, 2700.0),
    sync: str = "native",
) -> list[Ax25Packet]:
    """Decode AX.25 packets from Bell-202 AFSK audio (float32 stream).

    ``demod``: "discriminator" (the reference chain + an input band-pass,
    see bell202_demod) or "tones" (the dual-tone correlator).
    ``band=None`` restores the reference-faithful discriminator input.
    ``sync``: "native" (the sequential host/scan recurrence, bit-exact
    reference parity) or "events" (the event-driven device form —
    decode-equivalent, ~sps-times shorter sequential chain; see
    ops.symbol_sync.symbol_sync_events).

    Defaults (clock filter = 6-tap boxcar, 400-2700 Hz input band-pass)
    were swept against the 1000-frame decode-rate corpus in round 3:
    1000/1000 decoded vs 647/1000 for the reference-faithful
    configuration (the reference's own taps default is (0.5, 0.5),
    examples/ax25-1200-rx.rs:18-25).
    """
    audio = jnp.asarray(audio, jnp.float32)
    if demod == "tones":
        nrz = bell202_tone_demod(audio, float(samp_rate))
    else:
        nrz = bell202_demod(audio, float(samp_rate), band)
    if sync == "events":
        (vals, mask, _), _valid = ops.symbol_sync_events(
            np.asarray(nrz), float(samp_rate) / 1200.0,
            symbol_max_deviation, tuple(symbol_taps)
        )
        symbols = np.asarray(vals)[np.asarray(mask)]
    elif sync == "native":
        symbols = ops.recover_symbols(
            np.asarray(nrz), float(samp_rate) / 1200.0, symbol_max_deviation,
            symbol_taps
        )
    else:
        raise ValueError(f"unknown sync {sync!r}; use 'native' or 'events'")
    bits = np.asarray(ops.nrzi_decode(ops.binary_slicer(jnp.asarray(symbols))))
    packets, stats = ops.hdlc_deframe(
        bits, 10, 1500, keep_checksum=keep_checksum, fix_bits=fix_bits
    )
    return [Ax25Packet(np.asarray(d), int(p)) for d, p in packets]


def ax25_1200_rx_graph(
    audio,
    samp_rate: float,
    mesh=None,
    chunk_size: int | None = None,
    fix_bits: bool = False,
    symbol_taps=(1 / 6,) * 6,
    symbol_max_deviation: float = 0.5,
    keep_checksum: bool = False,
    band: tuple | None = (400.0, 2700.0),
    sync: str = "native",
) -> list[bytes]:
    """The same receiver as :func:`ax25_1200_rx`, built as a BLOCK
    flowgraph and run through the Graph runners.

    This mirrors the reference's actual structure — examples/
    ax25-1200-rx.rs:209-253 connects the chain as blocks and swaps Graph
    for MTGraph to go multi-core with one constructor flag.  Here that
    flag is ``mesh=``: the dense front-end (band-pass, Hilbert,
    discriminator, audio low-pass, centre offset) executes as ONE
    shard_map program with the sample axis sharded over the mesh and
    filter halos exchanged via ppermute, while the sequential tail
    (clock recovery, NRZI, HDLC) runs on the host.  ``chunk_size``
    selects streaming mode.  ``sync="events"`` swaps clock recovery to
    the event-driven device form (blocks.SymbolSync method="events" —
    the 11x decode-bank path, first-class in the block API since r5).
    Returns the decoded payloads as bytes.
    """
    from .. import blocks
    from ..graph import Graph

    g = Graph()
    sink = blocks.PduVectorSink()
    chain = [blocks.VectorSource(np.asarray(audio, np.float32))]
    if band is not None:
        chain.append(
            blocks.FftFilterFloat(
                tapgen.band_pass(samp_rate, band[0], band[1], 65, "hamming")
            )
        )
    lp = tapgen.low_pass(
        samp_rate, 1100.0, 200.0 if band is not None else 100.0, "hamming"
    )
    chain += [
        blocks.Hilbert(65),
        blocks.QuadratureDemod(1.0),
        blocks.FftFilterFloat(lp),
        blocks.AddConst(-np.float32(2.0 * np.pi * 1700.0 / samp_rate)),
        blocks.SymbolSync(
            float(samp_rate) / 1200.0, symbol_max_deviation,
            tuple(symbol_taps), method=sync if sync == "events" else "native",
        ),
        blocks.BinarySlicer(),
        blocks.NrziDecode(),
        blocks.HdlcDeframer(10, 1500, fix_bits, keep_checksum),
        sink,
    ]
    g.chain(*chain)
    if chunk_size:
        g.run_stream(chunk_size=chunk_size, mesh=mesh)
    else:
        g.run(mesh=mesh)
    return [bytes(np.asarray(p.data)) for p in sink.pdus()]


@functools.partial(
    jax.jit, static_argnames=("samp_rate", "new_rate", "cutoff", "twidth", "fast_fm")
)
def _channel_fm(iq, samp_rate, new_rate, cutoff, twidth, fast_fm=False):
    """Channel low-pass -> resample -> FM demod, fused in one jit."""
    lp = tapgen.low_pass_complex(samp_rate, cutoff, twidth, "hamming")
    x = ops.filter_complex(iq, lp)
    x = ops.rational_resampler(x, int(new_rate), int(samp_rate))
    if fast_fm:
        return ops.fast_fm(x)
    return ops.quadrature_demod(x, 1.0)


@functools.partial(
    jax.jit, static_argnames=("samp_rate", "new_rate", "cutoff", "iir_alpha")
)
def _burst_front(iq, samp_rate, new_rate, cutoff, iir_alpha):
    """Burst front-end: channel filter + resample, emitting the power
    envelope (for the burst gate) and the FM discriminator output."""
    lp = tapgen.low_pass_complex(samp_rate, cutoff, 100.0, "hamming")
    x = ops.filter_complex(iq, lp)
    x = ops.rational_resampler(x, int(new_rate), int(samp_rate))
    power = ops.single_pole_iir(ops.complex_to_mag2(x), iir_alpha)
    return power, ops.quadrature_demod(x, 1.0)


@functools.partial(jax.jit, static_argnames=("samp_rate", "cutoff"))
def _afsk_discriminator(fm, samp_rate, cutoff):
    """FM floats -> AFSK tone discriminator output (Hilbert + 2nd demod +
    low-pass), one jit (examples/ax25-1200-wpcr.rs:105-120)."""
    analytic = ops.hilbert_transform(fm, 65, "hamming")
    afsk = ops.quadrature_demod(analytic, 1.0)
    lp = tapgen.low_pass(samp_rate, cutoff, 100.0, "hamming")
    return ops.filter_float(afsk, lp)


def iq_front_end(iq, samp_rate: float, new_rate: float = 50_000.0, fast_fm: bool = False):
    """Complex IQ -> FM-demodulated floats at new_rate
    (examples/ax25-1200-rx.rs:163-188).  Dense chain runs in one jit;
    complex input is staged as f32 pairs (TPU transport constraint)."""
    return _channel_fm(
        stage_iq(iq), float(samp_rate), float(new_rate), 20_000.0, 100.0, bool(fast_fm)
    )


def ax25_1200_rx_iq(iq, samp_rate: float, **kw) -> list[Ax25Packet]:
    """Decode AX.25 1200 bd from complex IQ (FM carrier)."""
    audio = iq_front_end(iq, samp_rate)
    return ax25_1200_rx(np.asarray(audio), 50_000.0, **kw)


def ax25_9600_rx(
    iq,
    samp_rate: float,
    new_rate: float = 50_000.0,
    baud: float = 9600.0,
    symbol_taps=(0.0001, 0.99999999),
    symbol_max_deviation: float = 0.1,
    fix_bits: bool = False,
    sync: str = "native",
) -> list[Ax25Packet]:
    """AX.25 9600 bd G3RUH receiver, traditional symbol-sync path
    (reference examples/ax25-9600-rx.rs:136-207): 12.5 kHz channel filter ->
    resample to 50 kHz -> FM demod -> SymbolSync(zero-crossing TED, clamped
    IIR clock filter) -> slicer -> NRZI -> G3RUH descramble -> HDLC.
    ``sync`` as in :func:`ax25_1200_rx`."""

    nrz = _channel_fm(
        stage_iq(iq), float(samp_rate), float(new_rate), 12_500.0, 100.0
    )
    if sync == "events":
        (vals, mask, _), _valid = ops.symbol_sync_events(
            np.asarray(nrz), float(new_rate) / baud, symbol_max_deviation,
            tuple(symbol_taps)
        )
        syms = np.asarray(vals)[np.asarray(mask)]
    elif sync == "native":
        syms = ops.recover_symbols(
            np.asarray(nrz), float(new_rate) / baud, symbol_max_deviation,
            symbol_taps
        )
    else:
        raise ValueError(f"unknown sync {sync!r}; use 'native' or 'events'")
    bits = ops.binary_slicer(jnp.asarray(syms))
    bits = ops.nrzi_decode(bits)
    bits = np.asarray(ops.descramble(bits))
    packets, _ = ops.hdlc_deframe(bits, 10, 1500, fix_bits=fix_bits)
    return [Ax25Packet(np.asarray(d), int(p)) for d, p in packets]


def ax25_1200_wpcr_rx(
    iq,
    samp_rate: float,
    new_rate: float = 50_000.0,
    iir_alpha: float = 0.01,
    threshold: float = 0.0001,
    tail: int = 50,
    fix_bits: bool = False,
) -> list[Ax25Packet]:
    """AX.25 1200 bd AFSK burst receiver with whole-packet clock recovery
    (reference examples/ax25-1200-wpcr.rs:45-135): channel filter -> resample
    -> FM demod -> Hilbert -> second FM demod (AFSK tone discriminator) ->
    2.4 kHz low-pass -> power-gated burst capture -> Midpointer -> WPCR ->
    slicer -> NRZI -> HDLC (no descrambler at 1200 bd)."""

    power, fm = _burst_front(
        stage_iq(iq), float(samp_rate), float(new_rate), 20_000.0, float(iir_alpha)
    )
    nrz = _afsk_discriminator(fm, float(new_rate), 2400.0)
    n = min(int(nrz.shape[0]), int(power.shape[0]))
    start, end = ops.burst_tagger(power[:n], threshold)
    bursts = ops.stream_to_pdu(
        np.asarray(nrz)[:n], np.asarray(start), np.asarray(end), int(new_rate), tail
    )
    packets: list[Ax25Packet] = []
    # batched midpoint+WPCR: one jitted program per length bucket, one
    # readback for all bursts (vs the eager per-burst dispatch)
    for syms, info in ops.wpcr_batch(bursts):
        if not info["found"]:
            continue
        bits = np.asarray(ops.nrzi_decode(ops.binary_slicer(jnp.asarray(syms))))
        pkts, _ = ops.hdlc_deframe(bits, 10, 1500, fix_bits=fix_bits)
        packets.extend(Ax25Packet(np.asarray(d), int(p)) for d, p in pkts)
    return packets


def il2p_1200_rx(
    iq,
    samp_rate: float,
    symbol_taps=(0.5, 0.5),
    symbol_max_deviation: float = 0.5,
):
    """IL2P 1200 bd AFSK receiver (reference examples/il2p-1200-rx.rs:57-146):
    AFSK discriminator front-end -> SymbolSync -> slicer -> invert ->
    IL2P sync hunt + header decode.  Returns a list of Il2pHeader."""
    from ..ops.il2p import il2p_deframe

    # Same front-end as the Bell-202 chain: channelize+FM demod, then the
    # AFSK tone discriminator (examples/il2p-1200-rx.rs:76-99 is the same
    # chain as ax25-1200-rx's audio path).
    new_rate = 50_000.0
    fm = iq_front_end(iq, samp_rate, new_rate)
    nrz = bell202_demod(fm, new_rate)
    syms = ops.recover_symbols(
        np.asarray(nrz), new_rate / 1200.0, symbol_max_deviation, symbol_taps
    )
    bits = np.asarray(ops.binary_slicer(jnp.asarray(syms))) ^ 1
    return il2p_deframe(bits)


def g3ruh_modulate(
    frames,
    sample_rate: float,
    baud: float = 9600.0,
    if_rate: float = 48_000.0,
    deviation: float = 3000.0,
    amplitude: float = 0.5,
) -> np.ndarray:
    """G3RUH FSK transmitter (the TX half of reference examples/g3ruh.rs:
    246-289): HDLC frame -> G3RUH scramble -> NRZI -> upsample to IF rate ->
    bits to +/-deviation -> VCO -> amplitude -> resample to RF rate ->
    8.8 kHz channel low-pass.  Returns complex64 baseband."""
    chunks = []
    for frame in frames:
        chunks.append(ops.hdlc_frame(ops.fcs_add(np.asarray(frame, np.uint8))))
        # Inter-frame idle; also flushes the scrambler register (its output
        # is the input delayed by length+1 = 17 clocks).
        chunks.append(np.zeros(max(17, int(baud * 0.05)), np.uint8))
    if not chunks:
        return np.zeros(0, np.complex64)
    bits = np.concatenate(chunks)
    # One continuous LFSR over the whole stream, like the reference's
    # streaming Scrambler block.
    scrambled, _ = ops.scramble(jnp.asarray(bits, jnp.uint8))
    line = np.asarray(ops.nrzi_encode(scrambled))
    line = np.asarray(
        ops.rational_resampler(jnp.asarray(line, jnp.float32), int(if_rate), int(baud))
    )
    pn = np.where(line > 0, deviation, -deviation).astype(np.float32)
    return read_iq(_g3ruh_shape(pn, float(sample_rate), float(if_rate), float(amplitude)))


@functools.partial(jax.jit, static_argnames=("sample_rate", "if_rate", "amplitude"))
def _g3ruh_shape(pn, sample_rate, if_rate, amplitude):
    """VCO + gain + RF resample + 8.8 kHz channel filter, one jit
    (complex math must run under jit on some TPU transports)."""
    iq, _ = ops.vco(pn, 2.0 * np.pi / if_rate)
    iq = iq * jnp.float32(amplitude)
    iq = ops.rational_resampler(iq, int(sample_rate), int(if_rate))
    lp = tapgen.low_pass_complex(sample_rate, 8_800.0, 1_000.0, "hamming")
    return ops.filter_complex(iq, lp)


def ax25_9600_wpcr_rx(
    iq,
    samp_rate: float,
    new_rate: float = 50_000.0,
    iir_alpha: float = 0.01,
    threshold: float = 0.0001,
    max_burst: int = 50_000,
    tail: int = 50,
    fix_bits: bool = False,
) -> list[Ax25Packet]:
    """AX.25 9600 bd G3RUH burst receiver with whole-packet clock recovery.

    examples/ax25-9600-wpcr.rs:93-142.
    """
    power, demod = _burst_front(
        stage_iq(iq), float(samp_rate), float(new_rate), 20_000.0, float(iir_alpha)
    )
    start, end = ops.burst_tagger(power[: demod.shape[0]], threshold)
    bursts = ops.stream_to_pdu(
        np.asarray(demod), np.asarray(start), np.asarray(end), max_burst, tail
    )
    packets: list[Ax25Packet] = []
    for syms, info in ops.wpcr_batch(bursts):
        if not info["found"]:
            continue
        bits = np.asarray(ops.binary_slicer(jnp.asarray(syms)))
        bits = np.asarray(ops.nrzi_decode(jnp.asarray(bits)))
        bits = np.asarray(ops.descramble(jnp.asarray(bits)))
        pkts, _ = ops.hdlc_deframe(bits, 10, 1500, fix_bits=fix_bits)
        packets.extend(Ax25Packet(np.asarray(d), int(p)) for d, p in pkts)
    return packets
