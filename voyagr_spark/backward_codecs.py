"""Backward codec compatibility (reference module `lucene/backward-codecs`).

Reference semantics re-expressed (not ported): backward-codecs lets the
CURRENT reader open indexes written by OLDER format versions (the
Lucene4x/5x codec classes register read-only SPI entries), while every
write — including merges of an old index — uses the current codec, so an
old index upgrades incrementally as it merges.

Here the posting format history is:

* ``for128-1`` (round 2) — per-block headers: ``0x00`` all-equal collapse
  (varint value), ``1..64`` FOR bit-packed at the block max width,
  ``0xFF`` varint tail.
* ``hyb128-2`` (current) — the same header space PLUS ``0xFE`` raw
  one-byte-per-value blocks for small-delta streams.

Because the legacy header forms are a strict subset of the hybrid
decoder's, the current `codec.decode_stream`/`decode_blocks` already
decode ``for128-1`` blobs byte-for-byte (format-level round-trip proven
in `tests/test_backward_codecs.py` against a vendored legacy encoder) —
so backward compatibility is purely a version-gate policy: readers
accept the versions in :data:`READABLE_VERSIONS`, and any segment
written afterwards (appends, merges) is stamped and encoded with the
CURRENT codec, exactly the reference's upgrade-on-merge behavior.
"""

from __future__ import annotations

from .codec import CODEC_VERSION

#: versions the current reader decodes; writes always use CODEC_VERSION
READABLE_VERSIONS = frozenset({CODEC_VERSION, "for128-1"})


def check_readable(codec: object, index_dir: str) -> None:
    """SegmentInfos-style version check: accept the current codec and the
    registered read-only legacy versions, refuse everything else."""
    if codec not in READABLE_VERSIONS:
        raise ValueError(
            f"index at {index_dir} was written by codec {codec!r}; "
            f"this reader is {CODEC_VERSION!r} (legacy readable: "
            f"{sorted(READABLE_VERSIONS - {CODEC_VERSION})}) — rebuild "
            "the index"
        )
