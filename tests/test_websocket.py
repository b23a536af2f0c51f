"""Websocket transport for DATA_STREAM (reference src/data_stream.rs
websocket reader/writer; rustradio-ui/src/worker/source.rs consumes it).

The SAME credit-flow protocol must run unchanged over TCP and websocket
transports; these tests drive the ws server with the stdlib-only client.
"""

import asyncio

import pytest

from rustradio_tpu.io import data_stream as ds
from rustradio_tpu.io import websocket as ws


def test_accept_key_rfc_vector():
    # RFC 6455 section 1.3 handshake example
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


@pytest.mark.parametrize("n", [0, 1, 125, 126, 65535, 65536])
@pytest.mark.parametrize("mask", [False, True])
def test_frame_roundtrip(n, mask):
    payload = bytes(i % 256 for i in range(n))
    frame = ws.encode_frame(payload, ws.OP_BINARY, mask=mask)

    async def go():
        reader = asyncio.StreamReader()
        reader.feed_data(frame)
        reader.feed_eof()
        return await ws.read_frame(reader)

    opcode, got = asyncio.run(go())
    assert opcode == ws.OP_BINARY
    assert got == payload


def test_ws_data_stream_end_to_end():
    payload = bytes(range(256)) * 64  # 16 KiB

    def payload_at(pos, n):
        return payload[pos : pos + n]

    async def go():
        srv = ds.WsDataStreamServer(payload_at, packet_bytes=1024)
        _, port = await srv.serve()
        reader, writer = await ws.ws_connect("127.0.0.1", port)
        r = ds.AsyncReader(reader)
        w = ds.AsyncWriter(writer)
        await w.write_version()
        assert await r.read_version()
        await w.write_request_data("rtl-sdr", len(payload))
        buf = b""
        while len(buf) < len(payload):
            pkt = await asyncio.wait_for(r.read_packet(), timeout=10)
            assert pkt[0] == "data" and pkt[1] == "rtl-sdr"
            buf += pkt[2]
        await writer.close_ws()
        writer.close()
        await srv.close()
        return buf

    assert asyncio.run(asyncio.wait_for(go(), timeout=20)) == payload


def test_ws_credit_flow_windows():
    # the credit window is enforced across the ws transport: no more
    # bytes arrive than requested until a new grant replaces the window
    def payload_at(pos, n):
        return bytes([pos % 256]) * n

    async def go():
        srv = ds.WsDataStreamServer(payload_at, packet_bytes=128)
        _, port = await srv.serve()
        reader, writer = await ws.ws_connect("127.0.0.1", port)
        r = ds.AsyncReader(reader)
        w = ds.AsyncWriter(writer)
        await w.write_version()
        assert await r.read_version()
        await w.write_request_data("rtl-sdr", 128)
        pkt = await asyncio.wait_for(r.read_packet(), timeout=10)
        assert len(pkt[2]) == 128
        with pytest.raises(asyncio.TimeoutError):
            await asyncio.wait_for(r.read_packet(), timeout=0.3)
        await w.write_request_data("rtl-sdr", 256)
        total = 0
        while total < 256:
            pkt = await asyncio.wait_for(r.read_packet(), timeout=10)
            total += len(pkt[2])
        assert total == 256
        writer.close()
        await srv.close()

    asyncio.run(asyncio.wait_for(go(), timeout=20))


def test_ws_rejects_plain_http():
    async def go():
        srv = ds.WsDataStreamServer(lambda p, n: b"", packet_bytes=128)
        _, port = await srv.serve()
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        resp = await asyncio.wait_for(reader.read(64), timeout=10)
        assert b"400" in resp
        writer.close()
        await srv.close()

    asyncio.run(asyncio.wait_for(go(), timeout=20))


def test_read_frame_rejects_oversize_length():
    # a hostile 64-bit length must not commit the reader to buffering it
    import struct

    hdr = struct.pack("!BBQ", 0x80 | ws.OP_BINARY, 127, ws.MAX_FRAME + 1)

    async def go():
        reader = asyncio.StreamReader()
        reader.feed_data(hdr)
        with pytest.raises(ws.WsError):
            await ws.read_frame(reader)

    asyncio.run(asyncio.wait_for(go(), timeout=10))


def test_server_rejects_unmasked_client_data_frame():
    # RFC 6455 5.1: the server MUST reject unmasked client data frames
    # (close 1002); control frames and our own masked client path are
    # unaffected (the e2e tests above exercise that).
    async def go():
        srv = ds.WsDataStreamServer(lambda p, n: b"\0" * n, packet_bytes=128)
        _, port = await srv.serve()
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await ws.client_handshake(reader, writer, "127.0.0.1")
        writer.write(ws.encode_frame(b"\1\0\0\0\0", ws.OP_BINARY, mask=False))
        await writer.drain()
        # the server may push its version packet before reading; skip to
        # the close frame its reader sends on the violation
        while True:
            op, payload = await asyncio.wait_for(ws.read_frame(reader),
                                                 timeout=10)
            if op == ws.OP_CLOSE:
                break
        assert payload[:2] == (1002).to_bytes(2, "big")
        writer.close()
        await srv.close()

    asyncio.run(asyncio.wait_for(go(), timeout=20))
