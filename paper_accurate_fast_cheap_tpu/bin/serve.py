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
seconds of received audio.  Decodes from concurrent connections are
MICRO-BATCHED: a single worker thread owns the TPU, drains the request
queue, groups same-mode requests (up to ``--max_batch``) and runs one
batched decode — connections never serialize behind a per-request lock
(round-1 weak #8).
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


class DecodeWorker:
    """Single TPU-owning thread that micro-batches decode requests."""

    def __init__(self, model, max_batch: int = 8,
                 max_wait_s: float = 0.01):
        import queue

        self.model = model
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def decode(self, pcm: bytes, mode: str) -> str:
        import concurrent.futures

        fut: "concurrent.futures.Future" = concurrent.futures.Future()
        self.q.put((pcm, mode, fut))
        return fut.result()

    def _run(self):
        import queue

        while True:
            pcm, mode, fut = self.q.get()
            group = [(pcm, mode, fut)]
            # drain same-mode requests briefly to form a batch
            deadline = self.max_wait_s
            while len(group) < self.max_batch:
                try:
                    item = self.q.get(timeout=deadline)
                except queue.Empty:
                    break
                if item[1] != mode:
                    self.q.put(item)   # different mode: next round
                    break
                group.append(item)
            wavs = [np.frombuffer(g[0], np.int16).astype(np.float32)
                    / 32768.0 for g in group]
            try:
                texts = self.model.transcribe_batch(wavs, mode=mode)
                for (_, _, f), text in zip(group, texts):
                    f.set_result(text)
            except Exception as e:  # noqa: BLE001
                for _, _, f in group:
                    if not f.done():
                        f.set_exception(e)


class ASRHandler(socketserver.BaseRequestHandler):
    def handle(self):
        worker = self.server.decode_worker
        partial_interval = self.server.partial_interval
        sock = self.request
        if not websocket_handshake(sock):
            return
        pcm = b""
        last_partial_samples = 0
        mode = "ctc_greedy_search"
        session = None       # true-streaming (stateful incremental) mode
        last_partial_text = None
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
                        if session is not None:
                            session.abort()
                        session = None
                        last_partial_text = None
                        if msg.get("streaming"):
                            # incremental session: state-carried causal
                            # encoder, O(T) total work (the offline mode
                            # re-decodes the whole buffer per partial)
                            session = self._open_session()
                        write_frame(sock, json.dumps(
                            {"status": "ok",
                             "type": "server_ready"}).encode())
                    elif msg.get("signal") == "end":
                        if session is not None:
                            text = session.finalize().text
                            session = None
                        else:
                            text = self._decode(worker, pcm, mode)
                        write_frame(sock, json.dumps(
                            {"status": "ok", "type": "final_result",
                             "nbest": text}).encode())
                        break
                elif opcode == 2:  # binary pcm16
                    if session is not None:
                        wav = np.frombuffer(payload, np.int16
                                            ).astype(np.float32) / 32768.0
                        part = session.accept_waveform(wav)
                        if part.text != last_partial_text:
                            last_partial_text = part.text
                            write_frame(sock, json.dumps(
                                {"status": "ok",
                                 "type": "partial_result",
                                 "nbest": part.text}).encode())
                        continue
                    pcm += payload
                    n = len(pcm) // 2
                    if (n - last_partial_samples) >= int(
                        partial_interval * 16000
                    ):
                        last_partial_samples = n
                        text = self._decode(worker, pcm, mode)
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
        finally:
            if session is not None:   # dropped connection: free the slot
                try:
                    session.abort()
                except Exception:     # noqa: BLE001
                    log.exception("session abort failed")

    def _open_session(self):
        """Batched-worker slot if configured (and not full), else a
        dedicated per-connection session."""
        worker = getattr(self.server, "stream_worker", None)
        if worker is not None:
            try:
                return _BatchSessionAdapter(worker)
            except RuntimeError:      # all slots busy — degrade, don't drop
                log.warning("streaming_batch slots full; dedicated session")
        return self.server.session_factory()

    @staticmethod
    def _decode(worker, pcm: bytes, mode: str) -> str:
        if len(pcm) < 2 * 400:
            return ""
        return worker.decode(pcm, mode)


class ASRServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class _BatchSessionAdapter:
    """Session-shaped view of one BatchStreamWorker slot (so the ws
    handler code is identical for batched and per-connection modes)."""

    def __init__(self, worker):
        self._w = worker
        self._sid = worker.open()
        self._closed = False

    def accept_waveform(self, wav):
        self._w.accept_waveform(self._sid, wav)
        return self._w.partial(self._sid)

    def finalize(self):
        self._closed = True
        return self._w.finalize(self._sid)

    def abort(self):
        if not self._closed:          # free the slot on connection drop
            self._closed = True
            self._w.finalize(self._sid)


def serve(model, host: str = "0.0.0.0", port: int = 10086,
          partial_interval: float = 2.0, max_batch: int = 8,
          streaming_chunk: int = 16, streaming_batch: int = 0):
    from paper_accurate_fast_cheap_tpu.streaming import (
        BatchStreamWorker,
        StreamingBatch,
        make_session_factory,
    )

    srv = ASRServer((host, port), ASRHandler)
    srv.asr_model = model
    srv.decode_worker = DecodeWorker(model, max_batch=max_batch)
    srv.partial_interval = partial_interval
    # per-connection incremental sessions ({"signal": "start",
    # "streaming": true}); causal encoders only — all sessions share one
    # compiled chunk program
    srv.session_factory = make_session_factory(
        model.model, model.params, model.tokenizer, model.featurize,
        decoding_chunk_size=streaming_chunk)
    srv.stream_worker = None
    if streaming_batch > 0:
        # slot-batched streaming: one fused device step advances ALL
        # connections' windows (recurrent-attention encoders only)
        try:
            srv.stream_worker = BatchStreamWorker(StreamingBatch(
                model.model, model.params, model.tokenizer,
                model.featurize, max_sessions=streaming_batch,
                decoding_chunk_size=streaming_chunk))
        except ValueError as e:
            log.warning("--streaming_batch unavailable (%s); using "
                        "per-connection sessions", e)
    log.info("serving on ws://%s:%d", host, port)
    return srv


def main(argv=None):
    p = argparse.ArgumentParser(description="websocket ASR server")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=10086)
    p.add_argument("--partial_interval", type=float, default=2.0)
    p.add_argument("--max_batch", type=int, default=8,
                   help="micro-batch cap across concurrent connections")
    p.add_argument("--streaming_chunk", type=int, default=16,
                   help="encoder frames per incremental chunk for "
                        "streaming sessions")
    p.add_argument("--streaming_batch", type=int, default=0,
                   help="slot-batch up to N concurrent streaming "
                        "connections into one fused device step "
                        "(recurrent-attention causal encoders only)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.api import load_model

    model = load_model(args.model_dir, args.checkpoint)
    srv = serve(model, args.host, args.port, args.partial_interval,
                max_batch=args.max_batch,
                streaming_chunk=args.streaming_chunk,
                streaming_batch=args.streaming_batch)
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
