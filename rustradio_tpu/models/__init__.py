"""Full receiver/transmitter chains (the reference's examples/, as models)."""

from .ax25 import Ax25Packet, ax25_1200_rx, ax25_9600_wpcr_rx, bell202_demod, parse_ax25
from .fm import fm_demod_chain, wbfm_rx

__all__ = [
    "Ax25Packet",
    "ax25_1200_rx",
    "ax25_9600_wpcr_rx",
    "bell202_demod",
    "fm_demod_chain",
    "parse_ax25",
    "wbfm_rx",
]
