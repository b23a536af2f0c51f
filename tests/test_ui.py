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


def test_ui_live_sdr_retune():
    # live SdrSource feed + the /api/retune control endpoint: a dashboard
    # retune reaches the driver and relabels the axis
    import time

    from rustradio_tpu.hw import SdrSource, SimDriver
    from rustradio_tpu.apps.ui_server import sdr_chunks

    fs = 100_000.0
    # finite sim stream so the feed thread exits before the interpreter does
    drv = SimDriver(frequency=1e6, sample_rate=fs, gain=1.0,
                    tones=[(1e6 + 10_000.0, 1.0)], total_samples=2_000_000)
    src = SdrSource(drv)
    feed = SpectrumFeed(
        sdr_chunks(src, 25_000), samp_rate=fs, fft_size=256, fps=20.0,
        realtime=False,
    )
    srv = UiServer(feed, control=src.control()).start()
    try:
        meta = json.loads(_get(srv.address + "/api/meta"))
        assert meta["control"] is True
        applied = json.loads(
            _get(srv.address + "/api/retune?frequency=2000000&gain=0.5")
        )
        assert applied == {"frequency": 2000000.0, "gain": 0.5}
        # the command drains at the source's next emit
        deadline = time.time() + 10
        while time.time() < deadline and drv.frequency != 2_000_000.0:
            time.sleep(0.05)
        assert drv.frequency == 2_000_000.0
        assert drv.gain == 0.5
        meta = json.loads(_get(srv.address + "/api/meta"))
        assert meta["center_freq"] == 2_000_000.0
    finally:
        feed.done = True
        srv.stop()


def test_ui_ws_pushes_frames():
    # the /ws endpoint pushes the same frame batches /api/frames serves
    # (reference UI model: a pushed ws stream, not polling)
    import asyncio

    from rustradio_tpu.io import websocket as ws

    fs = 48_000.0
    t = np.arange(int(fs)) / fs
    iq = (0.5 * np.exp(2j * np.pi * 6_000.0 * t)).astype(np.complex64)
    chunks = [iq[i : i + 12_000] for i in range(0, len(iq), 12_000)]
    feed = SpectrumFeed(
        iter(chunks), samp_rate=fs, fft_size=256, fps=20.0, realtime=False,
        stats_fn=lambda: "stats over ws",
    )
    srv = UiServer(feed).start()
    try:
        feed.join(timeout=30)
        assert feed.done
        host, port = srv.httpd.server_address[:2]

        async def go():
            reader, writer = await asyncio.open_connection(host, port)
            await ws.client_handshake(reader, writer, f"{host}:{port}",
                                      "/ws?since=0")
            rows, stats = [], None
            while len(rows) == 0 or stats is None:
                op, payload = await asyncio.wait_for(ws.read_frame(reader),
                                                     timeout=10)
                if op != ws.OP_BINARY:
                    continue
                body = json.loads(payload.decode())
                rows.extend(body.get("rows", []))
                stats = body.get("stats", stats)
            writer.close()
            return rows, stats

        rows, stats = asyncio.run(asyncio.wait_for(go(), timeout=20))
        assert len(bytes.fromhex(rows[-1])) == 256
        assert stats == "stats over ws"
    finally:
        srv.stop()
