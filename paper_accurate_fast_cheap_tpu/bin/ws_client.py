"""WebSocket batch-decode client.

Parity target: `tools/batch-decode.py` — stream wav files to the server in
4096-byte chunks with the start/end JSON protocol, collect final results.
stdlib-only websocket client (matching bin/serve.py).
"""
from __future__ import annotations

import argparse
import base64
import json
import os
import socket
import struct
import sys

import numpy as np


def _handshake(sock, host, port):
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((
        f"GET / HTTP/1.1\r\nHost: {host}:{port}\r\n"
        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
    ).encode())
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("no handshake response")
        data += chunk
    if b"101" not in data.split(b"\r\n")[0]:
        raise ConnectionError(f"handshake rejected: {data[:100]!r}")


def _send(sock, payload: bytes, opcode: int):
    # client frames must be masked
    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([0x80 | n])
    elif n < 65536:
        header += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        header += bytes([0x80 | 127]) + struct.pack(">Q", n)
    sock.sendall(header + mask + masked)


def _recv(sock):
    def rexact(n):
        buf = b""
        while len(buf) < n:
            c = sock.recv(n - len(buf))
            if not c:
                raise ConnectionError("server closed")
            buf += c
        return buf

    hdr = rexact(2)
    opcode = hdr[0] & 0x0F
    length = hdr[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", rexact(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", rexact(8))[0]
    return opcode, rexact(length) if length else b""


def transcribe_file(host: str, port: int, wav_path: str,
                    chunk_bytes: int = 4096) -> str:
    from paper_accurate_fast_cheap_tpu.data.pipeline import _read_wav_bytes

    with open(wav_path, "rb") as f:
        wav, sr = _read_wav_bytes(f.read())
    if sr != 16000:
        from scipy.signal import resample_poly

        g = np.gcd(sr, 16000)
        wav = resample_poly(wav, 16000 // g, sr // g)
    pcm = np.clip(np.asarray(wav) * 32767, -32768, 32767).astype(
        "<i2").tobytes()

    sock = socket.create_connection((host, port))
    try:
        _handshake(sock, host, port)
        _send(sock, json.dumps({"signal": "start", "nbest": 1,
                                "continuous_decoding": True}).encode(), 1)
        for i in range(0, len(pcm), chunk_bytes):
            _send(sock, pcm[i : i + chunk_bytes], 2)
        _send(sock, json.dumps({"signal": "end"}).encode(), 1)
        final = ""
        while True:
            opcode, payload = _recv(sock)
            if opcode == 8:
                break
            msg = json.loads(payload.decode("utf-8"))
            if msg.get("type") == "final_result":
                final = msg.get("nbest", "")
                break
        return final
    finally:
        sock.close()


def main(argv=None):
    p = argparse.ArgumentParser(description="websocket decode client")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=10086)
    p.add_argument("wavs", nargs="+")
    args = p.parse_args(argv)
    for wav in args.wavs:
        text = transcribe_file(args.host, args.port, wav)
        print(f"{os.path.basename(wav)}\t{text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
