"""Data pipeline: shard/raw sources -> processor chain -> padded batches.

Parity targets: `wenet/dataset/dataset.py:28-228` (stage ordering),
`wenet/dataset/datapipes.py` (tar/raw sources `:705-824`, sort `:168`,
dynamic frame-budget batching `:333-367`, rank sharding `:414-438`),
`wenet/dataset/processor.py` (decode_wav `:178-211` incl. start/end segment
reads, resample `:294`, speed_perturb `:316`, filter `:213-291`, padding
`:684-764` sort-desc semantics), and `wenet/dataset/rev_processor.py:295-393`
(`generate_speaker_switch_utterances` long-form synthesis with `<sw>` tags).

TPU-first split of labor: the host pipeline stops at *waveforms + token ids*
(python generators instead of torchdata datapipes; no torch dependency);
fbank/CMVN/SpecAugment run on device inside the jitted step (see
`frontend/`), so batches are padded to bucketed shapes to bound XLA
recompilation.
"""
from __future__ import annotations

import io
import json
import logging
import random
import tarfile
import wave
import zipfile
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Iterator, List, Optional

import numpy as np

log = logging.getLogger(__name__)

AUDIO_EXTS = {"wav", "flac", "mp3", "m4a", "ogg", "opus"}


# ------------------------------------------------------------------ sources

def raw_source(list_file: str) -> Iterator[Dict]:
    """Each line of list_file is a JSON dict {key, wav, txt, [start, end]}."""
    with open(list_file, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            obj.setdefault("job", list_file)
            yield obj


def shard_list_source(list_file: str) -> Iterator[str]:
    with open(list_file, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield line


def tar_shard_source(paths: Iterable[str]) -> Iterator[Dict]:
    """Read WeNet tar shards: entries '{key}.txt' + '{key}.{audio_ext}'
    grouped per key (`datapipes.py:705-769` semantics)."""
    for path in paths:
        try:
            tf = tarfile.open(path, "r:*")
        except (tarfile.TarError, OSError) as e:
            log.warning("skipping bad shard %s: %s", path, e)
            continue
        with tf:
            sample: Dict[str, Any] = {}
            prev_key = None
            for member in tf:
                if not member.isfile():
                    continue
                name = member.name
                if "." not in name:
                    continue
                key, ext = name.rsplit(".", 1)
                if prev_key is not None and key != prev_key:
                    if "txt" in sample and "audio_bytes" in sample:
                        yield dict(sample, key=prev_key, job=path)
                    sample = {}
                data = tf.extractfile(member).read()
                if ext == "txt":
                    sample["txt"] = data.decode("utf-8").strip()
                elif ext in AUDIO_EXTS:
                    sample["audio_bytes"] = data
                    sample["audio_ext"] = ext
                prev_key = key
            if prev_key is not None and "txt" in sample \
                    and "audio_bytes" in sample:
                yield dict(sample, key=prev_key, job=path)


def zip_shard_source(paths: Iterable[str]) -> Iterator[Dict]:
    """Zip shards (`datapipes.py:539-627`)."""
    for path in paths:
        try:
            zf = zipfile.ZipFile(path)
        except (zipfile.BadZipFile, OSError) as e:
            log.warning("skipping bad zip shard %s: %s", path, e)
            continue
        with zf:
            groups: Dict[str, Dict] = {}
            for name in zf.namelist():
                if "." not in name:
                    continue
                key, ext = name.rsplit(".", 1)
                g = groups.setdefault(key, {})
                if ext == "txt":
                    g["txt"] = zf.read(name).decode("utf-8").strip()
                elif ext in AUDIO_EXTS:
                    g["audio_bytes"] = zf.read(name)
                    g["audio_ext"] = ext
            for key, g in groups.items():
                if "txt" in g and "audio_bytes" in g:
                    yield dict(g, key=key, job=path)


def shard_by_rank(items: Iterable, rank: int = 0, world_size: int = 1,
                  partition: bool = True) -> Iterator:
    """Rank partitioning (`datapipes.py:414-438`); partition=False
    replicates (CV behavior)."""
    for i, item in enumerate(items):
        if not partition or i % world_size == rank:
            yield item


# ---------------------------------------------------------------- processors

def decode_wav(samples: Iterable[Dict]) -> Iterator[Dict]:
    """Decode audio to float32 in int16 scale /(1<<15) normalized [-1,1]
    mono, with optional [start, end] second segment reads
    (`processor.py:178-211`)."""
    for s in samples:
        try:
            if "audio_bytes" in s:
                ext = s.get("audio_ext", "wav")
                if ext != "wav":
                    raise ValueError(f"unsupported audio format: {ext}")
                wav, sr = _read_wav_bytes(s.pop("audio_bytes"))
            else:
                with open(s["wav"], "rb") as f:
                    wav, sr = _read_wav_bytes(f.read())
            if "start" in s:
                start = int(float(s["start"]) * sr)
                end = int(float(s.get("end", len(wav) / sr)) * sr)
                wav = wav[start:end]
            s = dict(s, wav=wav, sample_rate=sr)
            s.pop("audio_ext", None)
            yield s
        except Exception as e:  # mirror MapperIgnoreErrorDataPipe
            log.warning("decode_wav failed for %s: %s", s.get("key"), e)


def _read_wav_bytes(data: bytes):
    # native fast path (C++ RIFF parser; handles the data-loader hot loop)
    try:
        from paper_accurate_fast_cheap_tpu import native

        out = native.parse_wav(data)
        if out is not None:
            return out
    except Exception:  # pragma: no cover - fall through to stdlib
        pass
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, sr


def resample(samples, resample_rate: int = 16000):
    from scipy.signal import resample_poly

    for s in samples:
        sr = s["sample_rate"]
        if sr != resample_rate:
            g = np.gcd(int(sr), int(resample_rate))
            wav = resample_poly(s["wav"], resample_rate // g, sr // g)
            s = dict(s, wav=wav.astype(np.float32),
                     sample_rate=resample_rate)
        yield s


def speed_perturb(samples, speeds=(0.9, 1.0, 1.1), rng: random.Random = None):
    """Random tempo change via polyphase resampling (the reference shells out
    to sox speed, `processor.py:316`)."""
    from scipy.signal import resample_poly

    rng = rng or random
    for s in samples:
        speed = rng.choice(speeds)
        if speed != 1.0:
            num = 100
            den = int(round(speed * 100))
            wav = resample_poly(s["wav"], num, den).astype(np.float32)
            s = dict(s, wav=wav)
        yield s


def merge_utterances(samples, min_sec: float = 75.0, max_sec: float = 85.0,
                     add_sw_token: bool = True, sw_token: str = "<sw>"):
    """Long-form training synthesis: concatenate consecutive utterances of
    the same job up to a duration budget (`rev_processor.py:295-393`)."""
    buf: List[Dict] = []
    dur = 0.0
    job = None

    def flush():
        nonlocal buf, dur
        if not buf:
            return None
        wav = np.concatenate([b["wav"] for b in buf])
        joiner = f" {sw_token} " if add_sw_token else " "
        txt = joiner.join(b["txt"] for b in buf)
        out = dict(buf[0], wav=wav, txt=txt,
                   key=buf[0]["key"] + f"_merged{len(buf)}")
        buf, dur = [], 0.0
        return out

    for s in samples:
        sd = len(s["wav"]) / s["sample_rate"]
        if job is not None and s.get("job") != job:
            out = flush()
            if out:
                yield out
        job = s.get("job")
        if dur + sd > max_sec and dur >= min_sec:
            out = flush()
            if out:
                yield out
        buf.append(s)
        dur += sd
    out = flush()
    if out:
        yield out


def tokenize(samples, tokenizer):
    for s in samples:
        tokens, ids = tokenizer.tokenize(s["txt"])
        yield dict(s, tokens=tokens, label=np.asarray(ids, np.int32))


def compute_num_frames(num_samples: int, sample_rate: int = 16000,
                       frame_shift_ms: int = 10) -> int:
    return num_samples // (sample_rate * frame_shift_ms // 1000)


def filter_samples(samples, max_length: int = 10240, min_length: int = 10,
                   token_max_length: int = 200, token_min_length: int = 1,
                   min_output_input_ratio: float = 5e-4,
                   max_output_input_ratio: float = 1.0):
    """Length/token filters on fbank-frame counts (`processor.py:213-291`)."""
    stats = {"kept": 0, "dropped": 0}
    for s in samples:
        frames = compute_num_frames(len(s["wav"]), s["sample_rate"])
        toks = len(s["label"])
        ok = (
            min_length <= frames <= max_length
            and token_min_length <= toks <= token_max_length
            and frames > 0
            and min_output_input_ratio <= toks / max(frames, 1)
            <= max_output_input_ratio
        )
        if ok:
            stats["kept"] += 1
            yield s
        else:
            stats["dropped"] += 1
    log.info("filter: kept=%d dropped=%d", stats["kept"], stats["dropped"])


def shuffle(samples, buffer_size: int = 10000, rng: random.Random = None):
    rng = rng or random
    buf = []
    for s in samples:
        buf.append(s)
        if len(buf) >= buffer_size:
            rng.shuffle(buf)
            yield from buf
            buf = []
    rng.shuffle(buf)
    yield from buf


def sort_by_length(samples, sort_size: int = 500):
    """Buffered sort by duration (`datapipes.py:168`)."""
    buf = []
    for s in samples:
        buf.append(s)
        if len(buf) >= sort_size:
            buf.sort(key=lambda x: len(x["wav"]))
            yield from buf
            buf = []
    buf.sort(key=lambda x: len(x["wav"]))
    yield from buf


# ---------------------------------------------------------------- batching

def static_batch(samples, batch_size: int = 16):
    buf = []
    for s in samples:
        buf.append(s)
        if len(buf) >= batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def dynamic_batch(samples, max_frames_in_batch: int = 12000,
                  max_words_in_batch: int = 0,
                  one_utt_per_job: bool = False):
    """Frame-budget batching (`processor.py:767-783` DynamicBatchWindow) with
    the optional word cap and one-utt-per-job dedup of the `distribute`
    batch type (`datapipes.py:207-331`)."""
    buf = []
    longest = 0
    words = 0
    jobs = set()
    for s in samples:
        frames = compute_num_frames(len(s["wav"]), s["sample_rate"])
        w = len(s.get("txt", "").split())
        longest_new = max(longest, frames)
        over_frames = longest_new * (len(buf) + 1) > max_frames_in_batch
        over_words = max_words_in_batch > 0 and \
            (words + w) > max_words_in_batch
        dup_job = one_utt_per_job and s.get("job") in jobs
        if buf and (over_frames or over_words or dup_job):
            yield buf
            buf, longest, words = [s], frames, w
            jobs = {s.get("job")}
        else:
            buf.append(s)
            longest = longest_new
            words += w
            jobs.add(s.get("job"))
    if buf:
        yield buf


def bucket_pad_length(n: int, buckets: Optional[List[int]] = None,
                      quantum: int = 16000) -> int:
    """Quantize padded lengths to a small set of shapes so XLA does not
    recompile per batch (TPU-specific; the torch reference pads exactly)."""
    if buckets:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def collate(batch: List[Dict], wav_quantum: int = 16000,
            label_quantum: int = 16) -> Dict[str, np.ndarray]:
    """Pad a list of samples into arrays (sorted desc by length like
    `processor.py:684-764`)."""
    batch = sorted(batch, key=lambda s: len(s["wav"]), reverse=True)
    B = len(batch)
    S = bucket_pad_length(max(len(s["wav"]) for s in batch), None,
                          wav_quantum)
    U = bucket_pad_length(max(len(s["label"]) for s in batch), None,
                          label_quantum)
    wavs = np.zeros((B, S), np.float32)
    wav_lens = np.zeros((B,), np.int32)
    labels = np.zeros((B, U), np.int32)
    label_lens = np.zeros((B,), np.int32)
    for i, s in enumerate(batch):
        n = len(s["wav"])
        wavs[i, :n] = s["wav"]
        wav_lens[i] = n
        u = len(s["label"])
        labels[i, :u] = s["label"]
        label_lens[i] = u
    return {
        "keys": [s["key"] for s in batch],
        "txts": [s.get("txt", "") for s in batch],
        "wavs": wavs, "wav_lens": wav_lens,
        "labels": labels, "label_lens": label_lens,
    }


# ---------------------------------------------------------------- assembly

def build_dataset(
    data_type: str,
    list_file: str,
    tokenizer,
    conf: Dict[str, Any],
    partition: bool = True,
    mode: str = "train",
    rank: int = 0,
    world_size: int = 1,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Assemble the processor chain per config (order follows
    `dataset/dataset.py:28-228`).  Yields collated numpy batches."""
    rng = random.Random(seed)
    if data_type == "raw":
        stream = shard_by_rank(raw_source(list_file), rank, world_size,
                               partition)
    elif data_type == "shard":
        shards = shard_by_rank(shard_list_source(list_file), rank,
                               world_size, partition)
        stream = tar_shard_source(shards)
    elif data_type == "zip_shard":
        shards = shard_by_rank(shard_list_source(list_file), rank,
                               world_size, partition)
        stream = zip_shard_source(shards)
    else:
        raise ValueError(f"unknown data_type {data_type!r}")

    stream = decode_wav(stream)
    if conf.get("merge_utterances", {}).get("enabled", False):
        mu = conf["merge_utterances"]
        stream = merge_utterances(
            stream, mu.get("min_sec", 75.0), mu.get("max_sec", 85.0),
            mu.get("add_sw_token", True),
        )
    if "resample_conf" in conf:
        stream = resample(stream,
                          conf["resample_conf"].get("resample_rate", 16000))
    if mode == "train" and conf.get("speed_perturb", False):
        stream = speed_perturb(stream, rng=rng)
    stream = tokenize(stream, tokenizer)
    stream = filter_samples(stream, **conf.get("filter_conf", {}))
    if mode == "train" and conf.get("shuffle", True):
        stream = shuffle(
            stream, conf.get("shuffle_conf", {}).get("shuffle_size", 10000),
            rng,
        )
    if conf.get("sort", True):
        stream = sort_by_length(
            stream, conf.get("sort_conf", {}).get("sort_size", 500)
        )
    bc = conf.get("batch_conf", {})
    btype = bc.get("batch_type", "static")
    if btype == "static":
        batches = static_batch(stream, bc.get("batch_size", 16))
    elif btype in ("dynamic", "distribute"):
        batches = dynamic_batch(
            stream, bc.get("max_frames_in_batch", 12000),
            bc.get("max_words_in_batch", 0),
            one_utt_per_job=(btype == "distribute"
                             and bc.get("one_utt_per_job", False)))
    else:
        raise ValueError(f"unknown batch_type {btype!r}")
    for b in batches:
        yield collate(b)
