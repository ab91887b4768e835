"""dictbuilder — cross-format dictionary trainer.

Reference parity: dict/ package (BuildZstdDict/BuildS2Dict/BuildRawDict,
dict/builder.go:68-93). Our trainer scores fixed-size fragments by
occurrence mass across samples and packs the winners most-used-last (small
offsets for hot content), then delegates format serialization to the codec
packages (zstd.BuildDict equivalent / s2 MakeDict equivalent).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

FRAG = 32
STRIDE = 8
MIN_COUNT = 2


def _fragments(samples, max_table: int = 1 << 20) -> Counter:
    counts: Counter = Counter()
    for s in samples:
        s = bytes(s)
        for i in range(0, max(len(s) - FRAG, 0), STRIDE):
            counts[s[i : i + FRAG]] += 1
        if len(counts) > max_table:
            counts = Counter(dict(counts.most_common(max_table // 2)))
    return counts


def build_raw_dict(samples, max_size: int = 64 << 10) -> bytes:
    """Content-only dictionary: high-coverage fragments, hottest at the end."""
    counts = _fragments(samples)
    chosen = []
    used = 0
    seen_content = bytearray()
    for frag, c in counts.most_common():
        if c < MIN_COUNT:
            break
        if used + len(frag) > max_size:
            continue
        if bytes(frag) in bytes(seen_content):
            continue
        chosen.append((c, frag))
        seen_content += frag
        used += len(frag)
        if used >= max_size - FRAG:
            break
    if not chosen:
        # degenerate: use the first sample's head
        head = bytes(samples[0])[:max_size] if samples else b"\x00" * 16
        return head if len(head) >= 16 else head + bytes(16 - len(head))
    chosen.sort(key=lambda t: t[0])  # ascending count: hottest last
    out = b"".join(f for _, f in chosen)
    if len(out) < 16:
        out += bytes(16 - len(out))
    return out


def build_zstd_dict(samples, max_size: int = 64 << 10, dict_id: int = 1) -> bytes:
    """Reference: dict.BuildZstdDict -> zstd dictionary blob."""
    from compress_tpu.zstd.dict import build_dict

    content = build_raw_dict(samples, max_size)
    return build_dict(list(samples), content, dict_id=dict_id)


def build_s2_dict(samples, max_size: int = 64 << 10) -> bytes:
    """Reference: dict.BuildS2Dict -> s2 dictionary blob."""
    from compress_tpu.s2.dict import make_dict

    content = build_raw_dict(samples, min(max_size, 64 << 10))
    return make_dict(content).bytes()


__all__ = ["build_raw_dict", "build_zstd_dict", "build_s2_dict"]
