"""Full receiver/transmitter chains (the reference's examples/, as models)."""

from .ax25 import (
    Ax25Packet,
    ax25_1200_rx,
    ax25_1200_rx_iq,
    ax25_1200_wpcr_rx,
    ax25_9600_rx,
    ax25_9600_wpcr_rx,
    bell202_demod,
    bell202_tone_demod,
    g3ruh_modulate,
    il2p_1200_rx,
    parse_ax25,
)
from .fm import am_rx, fm_demod_chain, wbfm_rx

__all__ = [
    "Ax25Packet",
    "am_rx",
    "ax25_1200_rx",
    "ax25_1200_rx_iq",
    "ax25_1200_wpcr_rx",
    "ax25_9600_rx",
    "ax25_9600_wpcr_rx",
    "bell202_demod",
    "bell202_tone_demod",
    "fm_demod_chain",
    "g3ruh_modulate",
    "il2p_1200_rx",
    "parse_ax25",
    "wbfm_rx",
]
