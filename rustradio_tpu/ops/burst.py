"""Burst tagging and stream→PDU extraction.

* ``burst_tagger`` (reference src/burst_tagger.rs): compares a trigger
  stream against a threshold and emits edge markers — on device this is a
  compare + diff producing a sparse edge stream instead of tags.
* ``stream_to_pdu`` (reference src/stream_to_pdu.rs:167-260): cuts the data
  stream into bursts [start_edge, end_edge) plus ``tail`` extra samples,
  dropping bursts longer than ``max_size``.  Segment boundaries are
  data-dependent, so extraction is host-side numpy over device-computed
  edges; the heavy per-sample math (power estimate, demod) stays on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def burst_tagger(trigger, threshold: float, last: bool = False):
    """Returns (start_edges, end_edges) boolean streams.

    start[i] is True where trigger crosses above threshold at i, end[i]
    where it crosses back at or below.  ``last`` is the carried previous
    comparison for streaming (reference src/burst_tagger.rs:69-86).
    """
    trigger = jnp.asarray(trigger)
    cur = trigger > jnp.asarray(threshold, trigger.dtype)
    prev = jnp.concatenate([jnp.asarray([last]), cur[:-1]])
    return cur & ~prev, ~cur & prev


def stream_to_pdu(
    data: np.ndarray,
    start: np.ndarray,
    end: np.ndarray,
    max_size: int,
    tail: int = 0,
) -> list[np.ndarray]:
    """Extract bursts from data given start/end edge streams (host-side).

    Semantics match the reference state machine (src/stream_to_pdu.rs):
    samples from the start-tagged sample up to (excluding) the end-tagged
    sample, plus ``tail`` samples starting at the end-tagged one; bursts
    longer than ``max_size`` are dropped; an unterminated burst at stream
    end is dropped (the reference would keep waiting).
    """
    data = np.asarray(data)
    start = np.asarray(start, bool)
    end = np.asarray(end, bool)
    pdus: list[np.ndarray] = []
    in_burst = False
    burst_start = 0
    for i in np.flatnonzero(start | end):
        if not in_burst and start[i]:
            in_burst = True
            burst_start = i
        elif in_burst and end[i]:
            stop = i + tail  # end-sample included only via tail
            seg = data[burst_start : min(stop, len(data))]
            if len(seg) <= max_size:
                pdus.append(seg)
            in_burst = False
    return pdus


def pdu_to_stream(pdus: list[np.ndarray]) -> np.ndarray:
    """Concatenate PDUs back into a stream (reference src/pdu_to_stream.rs)."""
    if not pdus:
        return np.zeros(0)
    return np.concatenate([np.asarray(p) for p in pdus])


def pdu_average(pdus: list[np.ndarray]) -> np.ndarray:
    """Elementwise mean of equal-length PDUs (reference src/pdu_average.rs)."""
    return np.mean(np.stack([np.asarray(p) for p in pdus]), axis=0)
