"""Minimal dependency-free RIFF/WAVE reader + writer.

The reference decodes audio through libsndfile (soundfile,
nn/audio_tasks.py:317-330); that binding is not available here, and the
MeerKAT corpus is plain PCM16 WAV (scripts/prepare_arb_data_for_audio_
pretraining.py writes WAV/PCM_16), so a small numpy parser covers the format:
PCM 8/16/24/32-bit and IEEE float32/64, mono or multichannel. A C++
batch-decoder (runtime/) fronts this for throughput; this module is the
portable fallback and the writer used by the data-prep tooling.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def _parse_header(f) -> Tuple[dict, int, int]:
    riff, size, wave = struct.unpack("<4sI4s", f.read(12))
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            raise ValueError("no data chunk found")
        cid, csize = struct.unpack("<4sI", hdr)
        if cid == b"fmt ":
            raw = f.read(csize)
            (audio_fmt, channels, sample_rate, _byte_rate, _block_align, bits) = (
                struct.unpack("<HHIIHH", raw[:16])
            )
            if audio_fmt == _EXTENSIBLE and csize >= 40:
                audio_fmt = struct.unpack("<H", raw[24:26])[0]
            fmt = {
                "format": audio_fmt,
                "channels": channels,
                "sample_rate": sample_rate,
                "bits": bits,
            }
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            return fmt, f.tell(), csize
        else:
            f.seek(csize + (csize & 1), 1)


def wav_info(path: str) -> dict:
    """sample_rate / channels / frames without decoding."""
    with open(path, "rb") as f:
        fmt, _, data_size = _parse_header(f)
    bytes_per = fmt["bits"] // 8
    fmt["frames"] = data_size // (bytes_per * fmt["channels"])
    return fmt


def read_wav(path: str, dtype=np.float32) -> Tuple[np.ndarray, int]:
    """Decode to float in [-1, 1]; (frames,) mono or (frames, channels)."""
    with open(path, "rb") as f:
        fmt, offset, data_size = _parse_header(f)
        f.seek(offset)
        raw = f.read(data_size)
    bits, channels = fmt["bits"], fmt["channels"]
    if fmt["format"] == _IEEE_FLOAT:
        data = np.frombuffer(raw, dtype=np.float32 if bits == 32 else np.float64)
        out = data.astype(dtype)
    elif fmt["format"] == _PCM:
        if bits == 16:
            out = np.frombuffer(raw, dtype="<i2").astype(dtype) / 32768.0
        elif bits == 32:
            out = np.frombuffer(raw, dtype="<i4").astype(dtype) / 2147483648.0
        elif bits == 8:
            out = (np.frombuffer(raw, dtype=np.uint8).astype(dtype) - 128.0) / 128.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            out = vals.astype(dtype) / 8388608.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {fmt['format']}")
    if channels > 1:
        out = out.reshape(-1, channels)
    return out, fmt["sample_rate"]


def write_wav(path: str, data: np.ndarray, sample_rate: int, subtype: str = "PCM_16"):
    """Write mono/multichannel audio (float in [-1, 1]) as PCM16 or FLOAT."""
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    frames, channels = data.shape
    if subtype == "PCM_16":
        payload = (
            np.clip(data, -1.0, 1.0 - 1.0 / 32768) * 32768.0
        ).astype("<i2").tobytes()
        bits, fmt_code = 16, _PCM
    elif subtype == "FLOAT":
        payload = data.astype("<f4").tobytes()
        bits, fmt_code = 32, _IEEE_FLOAT
    else:
        raise ValueError(subtype)
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(
            struct.pack(
                "<IHHIIHH", 16, fmt_code, channels, sample_rate, byte_rate, block_align, bits
            )
        )
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
