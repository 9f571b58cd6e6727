"""Socket server protocol round trip with a stub converter."""

import socket
import struct
import time

import numpy as np


class StubVC:
    block_frame = 1024

    def on_request(self, block, **kw):
        return block * 0.5, 0.1, [0, 1.0, 0]


def test_socket_server_roundtrip():
    from rvc_tpu.realtime.server import RealtimeSocketServer

    srv = RealtimeSocketServer(StubVC(), port=0)  # port 0: pick free
    # need the actual port: start manually
    import asyncio

    async def run_once():
        server = await asyncio.start_server(srv._handle, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=5)
            data = np.arange(8, dtype="<f4").tobytes()
            s.sendall(struct.pack("<I", len(data)) + data)
            hdr = s.recv(4)
            (n,) = struct.unpack("<I", hdr)
            buf = b""
            while len(buf) < n:
                buf += s.recv(n - len(buf))
            s.close()
            return np.frombuffer(buf, dtype="<f4")

        loop = asyncio.get_event_loop()
        result = await loop.run_in_executor(None, client)
        server.close()
        await server.wait_closed()
        return result

    out = asyncio.run(run_once())
    np.testing.assert_allclose(out, np.arange(8) * 0.5, atol=1e-6)


def test_websocket_server_reference_protocol():
    """Loopback through the ws-audio protocol: JSON params frame, then
    binary blocks; expect a latency text frame + converted block each
    (`rvc_mlx/realtime/client.py:16-96`)."""
    import asyncio
    import json

    import pytest

    websockets = pytest.importorskip("websockets")
    from rvc_tpu.realtime.server import RealtimeWebSocketServer

    srv = RealtimeWebSocketServer(voice_changer=StubVC())

    async def run_once():
        async with websockets.serve(srv._handle, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}/ws-audio") as ws:
                await ws.send(json.dumps({
                    "chunk_size": 2, "pitch": 0, "index_rate": 0,
                    "protect": 0.5, "input_audio_gain": 100.0,
                    "autotune": False, "autotune_strength": 1.0,
                    "kwargs": {}}))
                block = np.arange(256, dtype="<f4")
                results = []
                for _ in range(2):
                    await ws.send(block.tobytes())
                    lat = json.loads(await ws.recv())
                    assert lat["type"] == "latency"
                    out = np.frombuffer(await ws.recv(), dtype="<f4")
                    results.append(out)
                return results

    outs = asyncio.run(asyncio.wait_for(run_once(), timeout=60))
    for out in outs:
        np.testing.assert_allclose(out, np.arange(256) * 0.5, atol=1e-6)


def test_webui_serves_client_page():
    """The browser client app (reference native-GUI analog, SURVEY L10)
    serves a self-contained page wired to the ws endpoint."""
    import urllib.request

    from rvc_tpu.realtime.webui import WebUIServer

    srv = WebUIServer(host="127.0.0.1", port=0)  # port 0 -> ephemeral
    # pick a free port explicitly (asyncio start_server on port 0 works,
    # but we need to know it): bind a probe socket first
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv.port = port
    srv.ws_url = "ws://127.0.0.1:16006"
    srv.serve_in_thread()
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
        body = r.read().decode()
    assert r.status == 200
    assert "<html" in body and "ws://127.0.0.1:16006" in body
    assert "getUserMedia" in body and "WebSocket" in body
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=10) as r:
        assert r.read() == b"ok"
    import urllib.error

    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
