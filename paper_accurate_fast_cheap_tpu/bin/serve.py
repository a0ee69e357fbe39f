"""WebSocket ASR server (WeNet wire protocol).

The reference ships websocket *clients* (`tools/batch-decode.py`: start
JSON, 4096-byte binary audio chunks, end JSON; `tools/websocket/
performance-ws.py`) but its C++ server is out of tree (SURVEY.md §2.8).
This is a self-contained stdlib implementation (RFC6455 handshake + frame
codec, threaded) serving the same protocol:

  client -> {"signal": "start", "nbest": 1, "continuous_decoding": true}
  client -> binary pcm16 frames (16 kHz mono)
  client -> {"signal": "end"}
  server -> {"status": "ok", "type": "partial_result"|"final_result",
             "nbest": "<text>"}

Decoding: audio is accumulated and decoded with the loaded model
(`api.Model`); partial results are emitted every ``--partial_interval``
seconds of received audio.
"""
from __future__ import annotations

import argparse
import base64
import hashlib
import json
import logging
import socket
import socketserver
import struct
import sys
import threading

import numpy as np

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
log = logging.getLogger("serve")


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def read_frame(sock):
    """Returns (opcode, payload bytes)."""
    hdr = _recv_exact(sock, 2)
    opcode = hdr[0] & 0x0F
    masked = hdr[1] & 0x80
    length = hdr[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", _recv_exact(sock, 2))[0]
    elif length == 127:
        length = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    mask = _recv_exact(sock, 4) if masked else None
    payload = _recv_exact(sock, length) if length else b""
    if mask:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return opcode, payload


def write_frame(sock, payload: bytes, opcode: int = 1):
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([n])
    elif n < 65536:
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    sock.sendall(header + payload)


def websocket_handshake(sock) -> bool:
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(4096)
        if not chunk:
            return False
        data += chunk
    headers = {}
    for line in data.decode("latin1").split("\r\n")[1:]:
        if ": " in line:
            k, v = line.split(": ", 1)
            headers[k.lower()] = v
    key = headers.get("sec-websocket-key")
    if not key:
        return False
    accept = base64.b64encode(
        hashlib.sha1((key + _WS_MAGIC).encode()).digest()
    ).decode()
    sock.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )
    return True


class ASRHandler(socketserver.BaseRequestHandler):
    def handle(self):
        model = self.server.asr_model
        lock = self.server.model_lock
        partial_interval = self.server.partial_interval
        sock = self.request
        if not websocket_handshake(sock):
            return
        pcm = b""
        last_partial_samples = 0
        mode = "ctc_greedy_search"
        try:
            while True:
                opcode, payload = read_frame(sock)
                if opcode == 8:  # close
                    break
                if opcode == 1:  # text
                    msg = json.loads(payload.decode("utf-8"))
                    if msg.get("signal") == "start":
                        pcm = b""
                        last_partial_samples = 0
                        mode = msg.get("decode_mode", mode)
                        write_frame(sock, json.dumps(
                            {"status": "ok",
                             "type": "server_ready"}).encode())
                    elif msg.get("signal") == "end":
                        text = self._decode(model, lock, pcm, mode)
                        write_frame(sock, json.dumps(
                            {"status": "ok", "type": "final_result",
                             "nbest": text}).encode())
                        break
                elif opcode == 2:  # binary pcm16
                    pcm += payload
                    n = len(pcm) // 2
                    if (n - last_partial_samples) >= int(
                        partial_interval * 16000
                    ):
                        last_partial_samples = n
                        text = self._decode(model, lock, pcm, mode)
                        write_frame(sock, json.dumps(
                            {"status": "ok", "type": "partial_result",
                             "nbest": text}).encode())
        except ConnectionError:
            pass
        except Exception as e:  # noqa: BLE001 — report decode errors
            log.exception("handler error")
            try:
                write_frame(sock, json.dumps(
                    {"status": "failed", "message": str(e)}).encode())
            except OSError:
                pass

    @staticmethod
    def _decode(model, lock, pcm: bytes, mode: str) -> str:
        if len(pcm) < 2 * 400:
            return ""
        wav = np.frombuffer(pcm, np.int16).astype(np.float32) / 32768.0
        with lock:
            out = model.transcribe(wav, mode=mode)
        return out["text"]


class ASRServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def serve(model, host: str = "0.0.0.0", port: int = 10086,
          partial_interval: float = 2.0):
    srv = ASRServer((host, port), ASRHandler)
    srv.asr_model = model
    srv.model_lock = threading.Lock()
    srv.partial_interval = partial_interval
    log.info("serving on ws://%s:%d", host, port)
    return srv


def main(argv=None):
    p = argparse.ArgumentParser(description="websocket ASR server")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=10086)
    p.add_argument("--partial_interval", type=float, default=2.0)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.api import load_model

    model = load_model(args.model_dir, args.checkpoint)
    srv = serve(model, args.host, args.port, args.partial_interval)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
