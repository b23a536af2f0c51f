"""IL2P 1200 bd receiver (reference examples/il2p-1200-rx.rs).

Usage:
    python -m rustradio_tpu.apps.il2p_1200_rx -r il2p-50k.c32 --sample_rate 50k
"""

from __future__ import annotations

import argparse
import sys
import time

from ..dtypes import parse_frequency
from ..io import rawfile
from ..models.ax25 import il2p_1200_rx


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-r", "--read", required=True, help="complex64 IQ file")
    p.add_argument("--sample_rate", type=parse_frequency, default=50_000.0)
    p.add_argument("--symbol_taps", default="0.5,0.5")
    p.add_argument("--symbol_max_deviation", type=float, default=0.5)
    opt = p.parse_args(argv)

    iq = rawfile.read_samples(opt.read, "c32")
    taps = tuple(float(t) for t in opt.symbol_taps.split(","))
    t0 = time.time()
    headers = il2p_1200_rx(
        iq, float(opt.sample_rate),
        symbol_taps=taps, symbol_max_deviation=opt.symbol_max_deviation,
    )
    dt = time.time() - t0
    for h in headers:
        print(h.describe())
    print(f"decoded {len(headers)} IL2P headers in {dt:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
