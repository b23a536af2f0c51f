"""Dashboard server: meta/frames/stats endpoints and incremental polling."""

import json
import urllib.request

import numpy as np

from rustradio_tpu.ui import SpectrumFeed, UiServer


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_ui_server_endpoints():
    fs = 48_000.0
    t = np.arange(int(fs)) / fs
    iq = (0.5 * np.exp(2j * np.pi * 6_000.0 * t)).astype(np.complex64)
    chunks = [iq[i : i + 12_000] for i in range(0, len(iq), 12_000)]
    feed = SpectrumFeed(
        iter(chunks), samp_rate=fs, fft_size=256, fps=20.0, realtime=False,
        stats_fn=lambda: "block stats here",
    )
    srv = UiServer(feed).start()
    try:
        feed.join(timeout=30)
        assert feed.done

        page = _get(srv.address + "/").decode()
        assert "Waterfall" in page and "canvas" in page

        meta = json.loads(_get(srv.address + "/api/meta"))
        assert meta["fft_size"] == 256 and meta["samp_rate"] == fs

        fr = json.loads(_get(srv.address + "/api/frames?since=0"))
        assert fr["next"] > 0 and len(fr["rows"]) == fr["next"] - fr["start"]
        row = bytes.fromhex(fr["rows"][-1])
        assert len(row) == 256
        # the tone bin (+6 kHz of 48 kHz, DC-centered) must be the peak
        peak = int(np.argmax(np.frombuffer(row, np.uint8)))
        expect = 256 // 2 + int(6_000.0 / fs * 256)
        assert abs(peak - expect) <= 1

        # incremental poll from the tip returns nothing new
        fr2 = json.loads(_get(srv.address + f"/api/frames?since={fr['next']}"))
        assert fr2["rows"] == [] and fr2["done"]

        stats = json.loads(_get(srv.address + "/api/stats"))
        assert stats["text"] == "block stats here"
    finally:
        srv.stop()
