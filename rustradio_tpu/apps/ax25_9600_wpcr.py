"""AX.25 9600 bd G3RUH receiver with whole-packet clock recovery
(reference examples/ax25-9600-wpcr.rs).

Usage:
    python -m rustradio_tpu.apps.ax25_9600_wpcr -r capture.c32 \
        --sample_rate 50k -o packets/
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from ..dtypes import parse_frequency
from ..io import rawfile
from ..models.ax25 import ax25_9600_wpcr_rx, parse_ax25


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-r", "--read", required=True)
    p.add_argument("-o", "--out")
    p.add_argument("--sample_rate", type=parse_frequency, required=True)
    p.add_argument("--threshold", type=float, default=0.0001)
    p.add_argument("--iir_alpha", type=float, default=0.01)
    p.add_argument("--fix_bits", action="store_true")
    p.add_argument(
        "--no_prewarm", action="store_true",
        help="skip the background WPCR bucket compile at startup (see "
        "ops.prewarm_buckets / doc/performance.md 'first-packet latency')",
    )
    opt = p.parse_args(argv)

    if not opt.no_prewarm:
        from .. import ops

        ops.prewarm_buckets(batches=(1, 2, 4))

    iq = rawfile.read_samples(opt.read, "c32")
    t0 = time.time()
    pkts = ax25_9600_wpcr_rx(
        iq, float(opt.sample_rate), threshold=opt.threshold,
        iir_alpha=opt.iir_alpha, fix_bits=opt.fix_bits,
    )
    dt = time.time() - t0
    if opt.out:
        os.makedirs(opt.out, exist_ok=True)
        for i, pkt in enumerate(pkts):
            name = f"{time.strftime('%Y-%m-%dT%H:%M:%S')}.{i:06d}"
            with open(os.path.join(opt.out, name), "wb") as f:
                f.write(bytes(pkt))
    for pkt in pkts:
        addrs, info = parse_ax25(pkt.data)
        route = ">".join(addrs[:2][::-1]) if len(addrs) >= 2 else "?"
        print(f"{route}: {info[:100]!r}")
    print(f"decoded {len(pkts)} packets in {dt:.2f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
