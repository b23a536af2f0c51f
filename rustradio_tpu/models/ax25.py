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


@dataclasses.dataclass
class Ax25Packet:
    """One decoded AX.25 frame (CRC already checked and stripped)."""

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


@functools.partial(jax.jit, static_argnames=("samp_rate",))
def bell202_demod(audio, samp_rate: float):
    """Dense device part of the Bell-202 AFSK demod: audio -> NRZ floats.

    Hilbert -> quad demod -> 1100 Hz low-pass -> centre-frequency offset
    (examples/ax25-1200-rx.rs:229-247).
    """
    lp = tapgen.low_pass(samp_rate, 1100.0, 100.0, "hamming")
    center = 1700.0  # (1200 + 2200) / 2
    analytic = ops.hilbert_transform(audio, 65, "hamming")
    fm = ops.quadrature_demod(analytic, 1.0)
    filt = ops.fft_filter_float(fm, lp)
    return ops.add_const(filt, -jnp.float32(2.0 * np.pi * center / samp_rate))


def ax25_1200_rx(
    audio,
    samp_rate: float,
    fix_bits: bool = False,
    symbol_taps=(0.5, 0.5),
    symbol_max_deviation: float = 0.5,
) -> list[Ax25Packet]:
    """Decode AX.25 packets from Bell-202 AFSK audio (float32 stream)."""
    audio = jnp.asarray(audio, jnp.float32)
    nrz = bell202_demod(audio, float(samp_rate))
    (vals, mask, _), _ = ops.symbol_sync(
        nrz, float(samp_rate) / 1200.0, symbol_max_deviation, symbol_taps
    )
    symbols = np.asarray(vals)[np.asarray(mask)]
    bits = np.asarray(ops.nrzi_decode(ops.binary_slicer(jnp.asarray(symbols))))
    packets, stats = ops.hdlc_deframe(bits, 10, 1500, fix_bits=fix_bits)
    return [Ax25Packet(np.asarray(d), int(p)) for d, p in packets]


def iq_front_end(iq, samp_rate: float, new_rate: float = 50_000.0, fast_fm: bool = False):
    """Complex IQ -> FM-demodulated floats at new_rate
    (examples/ax25-1200-rx.rs:163-188)."""
    lp = tapgen.low_pass_complex(samp_rate, 20_000.0, 100.0, "hamming")
    x = ops.fft_filter(jnp.asarray(iq, jnp.complex64), lp)
    x = ops.rational_resampler(x, int(new_rate), int(samp_rate))
    if fast_fm:
        return ops.fast_fm(x)
    return ops.quadrature_demod(x, 1.0)


def ax25_1200_rx_iq(iq, samp_rate: float, **kw) -> list[Ax25Packet]:
    """Decode AX.25 1200 bd from complex IQ (FM carrier)."""
    audio = iq_front_end(iq, samp_rate)
    return ax25_1200_rx(np.asarray(audio), 50_000.0, **kw)


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
    lp = tapgen.low_pass_complex(samp_rate, 20_000.0, 100.0, "hamming")
    x = ops.fft_filter(jnp.asarray(iq, jnp.complex64), lp)
    x = ops.rational_resampler(x, int(new_rate), int(samp_rate))
    power = ops.single_pole_iir(ops.complex_to_mag2(x), iir_alpha)
    demod = ops.quadrature_demod(x, 1.0)
    start, end = ops.burst_tagger(power[: demod.shape[0]], threshold)
    bursts = ops.stream_to_pdu(
        np.asarray(demod), np.asarray(start), np.asarray(end), max_burst, tail
    )
    packets: list[Ax25Packet] = []
    for burst in bursts:
        centered, ok = ops.midpoint(jnp.asarray(burst))
        if not bool(np.asarray(ok)):
            continue
        samples, mask, info = ops.wpcr(centered)
        if not bool(np.asarray(info["found"])):
            continue
        syms = np.asarray(samples)[np.asarray(mask)]
        bits = np.asarray(ops.binary_slicer(jnp.asarray(syms)))
        bits = np.asarray(ops.nrzi_decode(jnp.asarray(bits)))
        bits = np.asarray(ops.descramble(jnp.asarray(bits)))
        pkts, _ = ops.hdlc_deframe(bits, 10, 1500, fix_bits=fix_bits)
        packets.extend(Ax25Packet(np.asarray(d), int(p)) for d, p in pkts)
    return packets
