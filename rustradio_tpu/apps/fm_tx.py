"""FM transmitter: audio file -> FM-modulated IQ (reference examples/fm_tx.rs).

Usage:
    python -m rustradio_tpu.apps.fm_tx -r audio.au --deviation 5k \
        --sample_rate 240k --out fm.c32
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import ops
from ..dtypes import parse_frequency
from ..io import au, rawfile


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-r", "--read", required=True, help=".au audio in")
    p.add_argument("--sample_rate", type=parse_frequency, default=240_000.0)
    p.add_argument("--deviation", type=parse_frequency, default=75_000.0)
    p.add_argument("--out", required=True, help=".c32 IQ out")
    opt = p.parse_args(argv)

    audio, rate = au.au_read(opt.read)
    # upsample audio to the IQ rate, then FM modulate with a VCO
    up = np.asarray(ops.rational_resampler(audio, int(opt.sample_rate), int(rate)))
    iq, _ = ops.vco(up, k=2 * np.pi * float(opt.deviation) / float(opt.sample_rate))
    rawfile.write_samples(opt.out, np.asarray(iq))
    print(f"wrote {len(up)} IQ samples to {opt.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
