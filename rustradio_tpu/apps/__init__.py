"""CLI applications mirroring the reference's examples/ binaries."""
