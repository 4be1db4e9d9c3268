"""Host-side I/O: WAV reading, Kaldi ark/scp feature reading, numpy fbank.

Dependency-free replacements for the reference's external readers:
  * kaldiio ark loading      <- neural_sp/datasets/asr/dataset.py:304
  * soundfile/wave reading   <- recipe stage-1 feature extraction
The binary Kaldi float-matrix format is parsed directly; our own pipelines
prefer ``.npy``/``.npz`` features, with ark kept for drop-in compatibility
with Kaldi-prepared TSVs.
"""
from __future__ import annotations

import struct
import wave as _wave

import numpy as np

from ..ops.audio import mel_filterbank, povey_window


def read_audio(path: str) -> tuple[np.ndarray, int]:
    """Dispatch on extension: .wav (stdlib), .flac (native C++ decoder,
    native/nsp_flac.cc — LibriSpeech stage-0) or .sph (NIST SPHERE,
    TEDLIUM stage-0)."""
    if path.lower().endswith(".flac"):
        from .native import read_flac
        out = read_flac(path)
        if out is None:
            raise RuntimeError(
                "FLAC input needs the native library; run `make -C native`")
        x, sr = out
        if x.ndim > 1:
            x = x.mean(axis=1)
        return x, sr
    if path.lower().endswith(".sph"):
        return read_sph(path)
    return read_wav(path)


# mu-law expansion table (G.711, mu = 255) for SPHERE sample_coding ulaw
_ULAW = None


def _ulaw_table() -> np.ndarray:
    global _ULAW
    if _ULAW is None:
        u = np.arange(256, dtype=np.uint8)
        u = ~u
        sign = np.where(u & 0x80, -1.0, 1.0)
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        mag = ((mantissa.astype(np.int32) << 3) + 0x84) << exponent
        _ULAW = (sign * (mag - 0x84) / 32768.0).astype(np.float32)
    return _ULAW


def read_sph(path: str) -> tuple[np.ndarray, int]:
    """Read a NIST SPHERE file (TEDLIUM/WSJ/swbd audio; the reference
    pipes these through Kaldi's sph2pipe, e.g.
    examples/tedlium/s5 data prep). Supports pcm (8/16/24-bit, either
    byte order) and mu-law codings; shorten-compressed files raise."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{path}: not a NIST SPHERE file")
        header_size = int(f.readline().strip())
        f.seek(0)
        header = f.read(header_size).decode("latin-1")
        fields = {}
        for line in header.splitlines()[2:]:
            line = line.strip()
            if line == "end_head" or not line:
                break
            parts = line.split(None, 2)
            if len(parts) == 3 and parts[1].startswith("-"):
                fields[parts[0]] = parts[2]
        sr = int(fields.get("sample_rate", 16000))
        n_bytes = int(fields.get("sample_n_bytes", 2))
        ch = int(fields.get("channel_count", 1))
        coding = fields.get("sample_coding", "pcm")
        byte_fmt = fields.get("sample_byte_format", "01")
        if "shorten" in coding or "shorten" in byte_fmt:
            raise ValueError(
                f"{path}: shorten-compressed SPHERE is not supported; "
                "decompress with sph2pipe first")
        f.seek(header_size)
        raw = f.read()
    if coding.startswith("ulaw") or coding.startswith("mu-law"):
        x = _ulaw_table()[np.frombuffer(raw, np.uint8)]
    elif n_bytes == 2:
        dt = np.dtype(np.int16).newbyteorder(
            "<" if byte_fmt == "01" else ">")
        x = np.frombuffer(raw, dt).astype(np.float32) / 32768.0
    elif n_bytes == 1:
        x = np.frombuffer(raw, np.int8).astype(np.float32) / 128.0
    elif n_bytes == 4:
        dt = np.dtype(np.int32).newbyteorder(
            "<" if byte_fmt == "01" else ">")
        x = np.frombuffer(raw, dt).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"{path}: unsupported sample_n_bytes {n_bytes}")
    if ch > 1:
        x = x[: len(x) // ch * ch].reshape(-1, ch).mean(axis=1)
    return x, sr


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a PCM WAV file -> (float32 samples in [-1, 1], sample_rate)."""
    with _wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(path: str, x: np.ndarray, sr: int = 16000) -> None:
    with _wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def _read_kaldi_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if c in (b" ", b""):
            break
        tok += c
    return tok.decode()


def read_kaldi_matrix(path_with_offset: str) -> np.ndarray:
    """Read one matrix from ``path`` or ``path:offset`` (binary FM/DM/FV)."""
    if ":" in path_with_offset and path_with_offset.rsplit(":", 1)[1].isdigit():
        path, off = path_with_offset.rsplit(":", 1)
        offset = int(off)
    else:
        path, offset = path_with_offset, 0
    with open(path, "rb") as f:
        f.seek(offset)
        if offset == 0:
            # may be "key <binary>" ark start: skip key token
            pos = f.tell()
            first = f.read(1)
            f.seek(pos)
            if first not in (b"\0",):
                _read_kaldi_token(f)
        marker = f.read(2)
        if marker != b"\0B":
            raise ValueError(f"non-binary kaldi data at {path_with_offset}")
        typ = _read_kaldi_token(f)
        if typ in ("FM", "DM"):
            dt = np.float32 if typ == "FM" else np.float64
            assert f.read(1) == b"\x04"
            rows = struct.unpack("<i", f.read(4))[0]
            assert f.read(1) == b"\x04"
            cols = struct.unpack("<i", f.read(4))[0]
            data = np.frombuffer(f.read(rows * cols * dt().itemsize), dt)
            return data.reshape(rows, cols).astype(np.float32)
        if typ in ("FV", "DV"):
            dt = np.float32 if typ == "FV" else np.float64
            assert f.read(1) == b"\x04"
            n = struct.unpack("<i", f.read(4))[0]
            return np.frombuffer(f.read(n * dt().itemsize), dt).astype(np.float32)
        raise ValueError(f"unsupported kaldi matrix type {typ!r} "
                         f"(compressed CM not supported; re-dump as npy)")


def write_kaldi_ark(ark_path: str, feats: dict[str, np.ndarray]) -> dict[str, str]:
    """Write a binary float-matrix ark; returns utt -> 'path:offset' map."""
    offsets = {}
    with open(ark_path, "wb") as f:
        for key, mat in feats.items():
            f.write(key.encode() + b" ")
            offsets[key] = f"{ark_path}:{f.tell()}"
            f.write(b"\0BFM ")
            f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
            f.write(b"\x04" + struct.pack("<i", mat.shape[1]))
            f.write(mat.astype(np.float32).tobytes())
    return offsets


def load_feat(feat_path: str) -> np.ndarray:
    """Dispatch on feature path: .npy | .npz:key | kaldi ark 'path:offset' | .wav."""
    if feat_path.endswith(".npy"):
        return np.load(feat_path)
    if ".npz:" in feat_path:
        path, key = feat_path.rsplit(":", 1)
        with np.load(path) as z:
            return z[key]
    if feat_path.endswith(".wav"):
        x, sr = read_wav(feat_path)
        return logmel_fbank_np(x, sample_rate=sr)
    return read_kaldi_matrix(feat_path)


def logmel_fbank_np(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    n_fft: int = 512,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
) -> np.ndarray:
    """Numpy mirror of ``ops.audio.logmel_fbank`` for host dataloader threads
    (keeps feature extraction off the TPU queue)."""
    win = int(sample_rate * frame_length_ms / 1000)
    hop = int(sample_rate * frame_shift_ms / 1000)
    n = len(waveform)
    n_frames = max(1 + (n - win) // hop, 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = waveform[np.clip(idx, 0, n - 1)].astype(np.float32)
    if remove_dc:
        frames = frames - frames.mean(1, keepdims=True)
    if preemphasis > 0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    frames = frames * povey_window(win)
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    mel = spec @ mel_filterbank(n_mels, n_fft, sample_rate)
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)
