"""Host-side I/O: file formats, raw sample files, network feeds."""

from .au import au_decode, au_encode
from .rawfile import read_samples, write_samples

__all__ = ["au_decode", "au_encode", "read_samples", "write_samples"]
