"""Deterministic synthetic multimodal table: opaque binary payloads + metadata.

Schema (the engine's multimodal column convention):

    media_id: int64
    kind: string            # "image" | "audio" | "video"
    payload: binary         # opaque encoded bytes (here: FAKE container format)
    width/height/channels: int32   (images & video; 0 otherwise)
    sample_rate: int32             (audio; 0 otherwise)
    n_frames: int32                (video; 1 for image, 0 for audio)

The payload is a fake-but-parseable container: a 16-byte header
(``FMED`` magic + kind code + dims) followed by deterministic pseudo-random
bytes — enough structure that the decode stage does real byte-level work,
with no image/audio libraries required (none are in this container).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MEDIA_MAGIC = b"FMED"
KIND_CODES = {"image": 1, "audio": 2, "video": 3}
KIND_NAMES = {v: k for k, v in KIND_CODES.items()}

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

HEADER_FMT = "<4sBHHBIH"  # magic, kind, width, height, channels, rate, frames
HEADER_LEN = struct.calcsize(HEADER_FMT)


def pack_header(kind: str, width: int, height: int, channels: int, sample_rate: int, n_frames: int) -> bytes:
    return struct.pack(
        HEADER_FMT, MEDIA_MAGIC, KIND_CODES[kind], width, height, channels, sample_rate, n_frames
    )


def parse_header(payload: bytes) -> dict:
    """Parse the fake container header; raises ValueError on bad payloads."""
    if len(payload) < HEADER_LEN:
        raise ValueError(f"payload too short: {len(payload)} < {HEADER_LEN}")
    magic, kind_code, width, height, channels, rate, frames = struct.unpack(
        HEADER_FMT, payload[:HEADER_LEN]
    )
    if magic != MEDIA_MAGIC:
        raise ValueError(f"bad magic: {magic!r}")
    if kind_code not in KIND_NAMES:
        raise ValueError(f"unknown kind code: {kind_code}")
    return {
        "kind": KIND_NAMES[kind_code],
        "width": width,
        "height": height,
        "channels": channels,
        "sample_rate": rate,
        "n_frames": frames,
    }


def generate_media_table(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h, c, rate, frames = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3, 0, 1
            body_len = w * h * c
        elif kind == "audio":
            w, h, c, frames = 0, 0, 0, 0
            rate = int(rng.choice([8000, 16000, 44100]))
            body_len = int(rng.integers(256, 2048))
        else:
            w, h, c, rate = int(rng.integers(8, 32)), int(rng.integers(8, 32)), 3, 0
            frames = int(rng.integers(2, 12))
            body_len = w * h * c * frames
        body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
        payload = pack_header(kind, w, h, c, rate, frames) + body
        # ~3% corrupt payloads: exercise per-row error isolation
        if i % 37 == 0:
            payload = payload[: HEADER_LEN // 2]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "width": w,
                "height": h,
                "channels": c,
                "sample_rate": rate,
                "n_frames": frames,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def write_media_table(path: str | Path, n_rows: int, seed: int = 42) -> int:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    table = generate_media_table(n_rows, seed)
    pq.write_table(table, path, row_group_size=256)
    return table.num_rows
