"""Delta + varint posting-list codec with a per-128-doc block directory.

Spark-first re-expression of the Lucene50 postings format
(`/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene50/
Lucene50PostingsWriter.java:214-301`, BLOCK_SIZE=128 at
`Lucene50PostingsFormat.java:398`):

* doc ids are delta-encoded, then cut into 128-value blocks encoded with a
  PER-BLOCK codec choice: blocks whose max delta fits one byte (the
  overwhelmingly common hot-term / tf case) are stored as raw bytes
  (header 0xFE — decode is a single gather + astype, no bit math at all),
  all-equal full blocks collapse to one value (ForUtil.java:41,157-165),
  and only genuinely wide blocks are FOR bit-packed at the block's max bit
  width (ForUtil.java:157-243); a wide <128 tail is varint
  (Lucene50PostingsWriter.java:340-348).  This is the same cost model as
  Lucene's own all-equal special case: on corpus-shaped small-delta
  streams the raw-byte form decodes ~20x faster than numpy FOR unpacking
  (measured in BENCH/CODEC_MICRO.md) and Parquet page compression
  recovers the <=12% byte overhead vs w<8 packing.  Term frequencies use
  the same scheme; per-doc position deltas stay one varint stream (B7
  divergence: positions are bulk-decoded whole, so the block win is nil
  and Parquet page compression recovers the constant factor).
* the multi-level skip list (`Lucene50SkipWriter.java:27-46`) becomes a flat
  *block directory*: per 128-doc block we store max docid / max tf / min
  quantized field length as plain array columns next to the blob, so skipping
  is `np.searchsorted` on column data and Catalyst can prune the blob column
  when it is not needed.  Block-max tf/len power WAND-style pruning (SURVEY
  §2.7 K9).

All encode/decode paths are vectorized numpy — no per-element Python loops.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene50PostingsFormat.java:398

#: on-disk posting format version, stamped into index meta; readers refuse
#: indexes written by a different codec (the SegmentInfos version check)
CODEC_VERSION = "hyb128-2"


# 7-bit varint group boundaries (bytes per value = searchsorted rank + 1);
# shared by the encode fast paths — built once, not per call
_VARINT_BOUNDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array, fully vectorized."""
    blob, _ = varint_encode_with_offsets(values)
    return blob


def varint_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """As varint_encode, also returning per-value byte offsets (len n+1).

    offsets[i] is where value i starts; offsets[-1] == len(blob).  Sampling
    offsets at block boundaries gives random access into the stream — the
    basis of the block directory's decode skipping.
    """
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # fast path: every value fits one varint byte (typical for tf and
    # position-delta streams) — the blob IS the value array
    if vals.max() < 128:
        return vals.astype(np.uint8).tobytes(), np.arange(
            vals.size + 1, dtype=np.int64
        )
    # bytes per value = ceil(bit_length/7): one searchsorted pass over the
    # 7-bit group boundaries (pure uint64 compare, no float round-trip)
    bounds = _VARINT_BOUNDS
    nbytes = np.searchsorted(bounds, vals, side="right").astype(np.int64) + 1
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    total = int(offsets[-1])
    out = np.zeros(total, dtype=np.uint8)
    # byte-SLOT formulation: slot k of every value needing >k bytes is one
    # vectorized pass; mixed streams (position deltas: a handful of >=128
    # restarts inside tens of millions of single-byte gaps) then cost one
    # full-width pass for slot 0 plus tiny passes for the multi-byte
    # minority — ~1.8x faster than repeating every value nbytes times
    starts = offsets[:-1]
    kmax = int(nbytes.max())
    first = (vals & np.uint64(0x7F)).astype(np.uint8)
    if kmax > 1:
        first |= np.where(nbytes > 1, 0x80, 0).astype(np.uint8)
    out[starts] = first
    for k in range(1, kmax):
        sel = np.flatnonzero(nbytes > k)
        b = ((vals[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        b |= np.where(nbytes[sel] > k + 1, 0x80, 0).astype(np.uint8)
        out[starts[sel] + k] = b
    return out.tobytes(), offsets.astype(np.int64)


def varint_decode(blob: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream to uint64, fully vectorized."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # fast path mirroring the encoder's: every value fits one byte (typical
    # for tf and position-delta streams) — the blob IS the value array, no
    # scatter-add needed (np.add.at is the slow op in the general path)
    if is_last.all():
        if count is not None and raw.size != count:
            raise ValueError(f"varint stream holds {raw.size} values, expected {count}")
        return raw.astype(np.uint64)
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = ends.size
    # position of each byte within its value
    pos = np.arange(raw.size, dtype=np.int64) - np.repeat(starts, lengths)
    group = np.repeat(np.arange(n, dtype=np.int64), lengths)
    contrib = (raw & np.uint8(0x7F)).astype(np.uint64) << (
        pos.astype(np.uint64) * np.uint64(7)
    )
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, group, contrib)
    if count is not None and n != count:
        raise ValueError(f"varint stream holds {n} values, expected {count}")
    return out


# ---------------------------------------------------------------------------
# FOR (Frame-of-Reference) bit-packed blocks — the Lucene50 block scheme
# (ForUtil.java: full 128-value blocks packed at the block's max bit width;
# all-equal block collapses to the single value, ForUtil.java:41,157-165;
# the <128 tail stays varint, Lucene50PostingsWriter.java:340-348).
#
# Per-block wire format (each block independently decodable from its byte
# slice, delimited by the *_boff offset arrays):
#   header 0x00:        all 128 values equal; varint(value) follows
#   header w (1..64):   ceil(count*w/8) bytes, values little-endian bit-packed
#   header 0xFE:        count raw bytes, one value per byte (all values <256)
#   header 0xFF:        varint stream (the wide tail block form)
# ---------------------------------------------------------------------------

_TAIL = 0xFF
_RAW8 = 0xFE  # small-delta block: payload is the uint8 value array itself
_BIT_WEIGHTS = {}


def _weights(w: int) -> np.ndarray:
    got = _BIT_WEIGHTS.get(w)
    if got is None:
        got = _BIT_WEIGHTS[w] = (np.uint64(1) << np.arange(w, dtype=np.uint64))
    return got


def _bit_width(vals: np.ndarray) -> int:
    m = int(vals.max())
    return max(1, m.bit_length())


def pack_blocks(vals_2d: np.ndarray, w: int) -> np.ndarray:
    """Bit-pack (nblocks, count) uint64 values at width w -> (nblocks, nbytes)
    uint8, little-endian bit order, fully vectorized."""
    nb, cnt = vals_2d.shape
    shifts = np.arange(w, dtype=np.uint64)
    bits = ((vals_2d[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(nb, cnt * w)
    return np.packbits(flat, axis=1, bitorder="little")


def unpack_blocks(raw_2d: np.ndarray, w: int) -> np.ndarray:
    """(nblocks, nbytes) same-width blocks -> (nblocks, count) uint64.

    Byte-gather kernel: value i spans bytes [i*w//8, ...]; each value is
    assembled from ceil((w+7)/8) gathered bytes + one shift/mask — ~10x
    faster than the unpackbits route (which materializes 8x the data).
    Falls back to unpackbits for w > 56 (bit offset + width can exceed 64).
    """
    nb, nbytes = raw_2d.shape
    count = nbytes * 8 // w
    if w > 56:
        bits = np.unpackbits(raw_2d, axis=1, bitorder="little")[:, : count * w]
        return (bits.reshape(nb, count, w).astype(np.uint64) * _weights(w)).sum(
            axis=2, dtype=np.uint64
        )
    bitpos = np.arange(count, dtype=np.int64) * w
    s = bitpos >> 3
    r = (bitpos & 7).astype(np.uint64)
    k = (w + 7 + 7) // 8  # bytes covering r+w bits
    acc = np.zeros((nb, count), dtype=np.uint64)
    for j in range(k):
        idx = np.minimum(s + j, nbytes - 1)
        acc |= raw_2d[:, idx].astype(np.uint64) << np.uint64(8 * j)
    mask = np.uint64((1 << w) - 1)
    return (acc >> r) & mask


def unpack_block(raw: np.ndarray, w: int, count: int) -> np.ndarray:
    """Inverse of pack_blocks for ONE block's bytes -> uint64[count]."""
    return unpack_blocks(raw[None, :], w)[0, :count]


def encode_block(vals: np.ndarray) -> bytes:
    """Encode one block of uint64 values (<= BLOCK_SIZE)."""
    vals = np.asarray(vals, dtype=np.uint64)
    if vals.size == BLOCK_SIZE and vals.max() == vals.min():
        return b"\x00" + varint_encode(vals[:1])  # all-equal (ForUtil.java:41)
    if vals.size and vals.max() < 256:
        return bytes([_RAW8]) + vals.astype(np.uint8).tobytes()
    if vals.size == BLOCK_SIZE:
        w = _bit_width(vals)
        return bytes([w]) + pack_blocks(vals[None, :], w).tobytes()
    return bytes([_TAIL]) + varint_encode(vals)


def decode_block(blob, count: int) -> np.ndarray:
    """Decode one block's byte slice (header + payload) -> uint64[count]."""
    raw = np.frombuffer(bytes(blob), dtype=np.uint8)
    h = int(raw[0])
    if h == _RAW8:
        return raw[1: 1 + count].astype(np.uint64)
    if h == _TAIL:
        return varint_decode(raw[1:].tobytes(), count=count)
    if h == 0:
        v = varint_decode(raw[1:].tobytes(), count=1)
        return np.full(count, v[0], dtype=np.uint64)
    return unpack_block(raw[1:], h, count)


def decode_stream(blob: bytes, offsets: np.ndarray, total: int) -> np.ndarray:
    """Decode a whole multi-block stream given its block byte offsets.

    Fast path: when every block is RAW8 (corpus-shaped small-delta streams —
    the hot-term / tf norm) the value stream IS the blob minus its header
    bytes: one boolean mask + one astype, the same cost as the old varint
    single-byte path.  Otherwise blocks are grouped by header and each group
    is decoded in ONE vectorized pass (packed groups share byte length
    1 + 16w), so even a mixed hot-term stream costs a few numpy calls, not a
    per-block Python loop."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    nblocks = offsets.size - 1
    if nblocks <= 0 or total == 0:
        return np.zeros(0, dtype=np.uint64)
    headers = raw[offsets[:-1]]
    if (headers == _RAW8).all():
        # full RAW8 blocks are fixed 129-byte records: strip the header
        # column with one reshape (memcpy speed), append the raw tail
        nfull = total // BLOCK_SIZE
        out = np.empty(total, dtype=np.uint64)
        if nfull:
            out[: nfull * BLOCK_SIZE] = raw[
                : nfull * (BLOCK_SIZE + 1)
            ].reshape(nfull, BLOCK_SIZE + 1)[:, 1:].ravel()
        tail = total - nfull * BLOCK_SIZE
        if tail:
            out[nfull * BLOCK_SIZE:] = raw[offsets[-2] + 1: offsets[-2] + 1 + tail]
        return out
    counts = np.minimum(
        total - np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE, BLOCK_SIZE
    )
    out = np.empty(total, dtype=np.uint64)
    starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
    _decode_groups(raw, offsets, headers, np.arange(nblocks), starts, counts, out)
    return out


def _decode_groups(
    raw: np.ndarray,
    offsets: np.ndarray,
    headers: np.ndarray,
    block_idx: np.ndarray,
    out_starts: np.ndarray,
    counts: np.ndarray,
    out: np.ndarray,
) -> None:
    """Decode the blocks `block_idx` (header per entry in `headers`) into
    `out` at `out_starts`, one vectorized pass per header group."""
    for w in np.unique(headers):
        w = int(w)
        sel = np.flatnonzero(headers == w)
        if w == 0:
            # all-equal blocks are the COMMONEST tf-stream form (tf=1 runs);
            # the one-varint-byte value of a full block decodes as a single
            # vectorized broadcast scatter — python loop only for the rare
            # multi-byte value or a non-full block
            i_all = block_idx[sel]
            fast = (offsets[i_all + 1] - offsets[i_all] == 2) & (
                counts[sel] == BLOCK_SIZE
            )
            f = sel[fast]
            if f.size:
                vals = raw[offsets[block_idx[f]] + 1].astype(np.uint64)
                out[
                    (out_starts[f][:, None] + np.arange(BLOCK_SIZE)).ravel()
                ] = np.repeat(vals, BLOCK_SIZE)
            for j in sel[~fast]:
                i = block_idx[j]
                v = varint_decode(
                    raw[offsets[i] + 1: offsets[i + 1]].tobytes(), count=1
                )
                out[out_starts[j]: out_starts[j] + counts[j]] = v[0]
        elif w == _TAIL:
            for j in sel:  # the (at most one) wide varint tail block
                i = block_idx[j]
                out[out_starts[j]: out_starts[j] + counts[j]] = varint_decode(
                    raw[offsets[i] + 1: offsets[i + 1]].tobytes(),
                    count=int(counts[j]),
                )
        elif w == _RAW8:
            full = sel[counts[sel] == BLOCK_SIZE]
            if full.size:
                gather = (
                    offsets[block_idx[full]][:, None]
                    + 1
                    + np.arange(BLOCK_SIZE, dtype=np.int64)
                )
                out[
                    (out_starts[full][:, None] + np.arange(BLOCK_SIZE)).ravel()
                ] = raw[gather].ravel()
            for j in sel[counts[sel] < BLOCK_SIZE]:  # the (<=1) raw tail
                i = block_idx[j]
                c = int(counts[j])
                out[out_starts[j]: out_starts[j] + c] = raw[
                    offsets[i] + 1: offsets[i] + 1 + c
                ]
        else:
            nbytes = 16 * w  # ceil(128*w/8)
            gather = (
                offsets[block_idx[sel]][:, None]
                + 1
                + np.arange(nbytes, dtype=np.int64)
            )
            vals = unpack_blocks(raw[gather], w)  # (len(sel), 128)
            out[(out_starts[sel][:, None] + np.arange(BLOCK_SIZE)).ravel()] = (
                vals.ravel()
            )


def decode_blocks(
    blob: bytes,
    offsets: np.ndarray,
    block_idx: np.ndarray,
    counts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode an arbitrary SUBSET of blocks in one width-grouped pass.

    `block_idx` are block indices into `offsets` (any order); `counts` is the
    per-block value count aligned with `block_idx`.  Returns (flat values in
    block_idx order, value-start offset per block, len nblocks+1).  This is
    the batched replacement for per-block `decode_block` loops on the
    skip/blockmax paths (VERDICT r2 "What's wrong #2")."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    block_idx = np.asarray(block_idx, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    out_starts = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    out = np.empty(int(out_starts[-1]), dtype=np.uint64)
    if block_idx.size:
        headers = raw[offsets[block_idx]]
        _decode_groups(
            raw, offsets, headers, block_idx, out_starts[:-1], counts, out
        )
    return out, out_starts


def encoded_block_lengths(
    deltas: np.ndarray, block_start: np.ndarray, block_count: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch planning for FOR encoding: per-block (byte length, header, width).

    header semantics as in encode_block; returns (lengths incl. header,
    headers, widths) as int64/uint8/int64 arrays."""
    nb = block_start.size
    lengths = np.empty(nb, dtype=np.int64)
    headers = np.empty(nb, dtype=np.uint8)
    # per-block max/min via reduceat on the flat delta stream
    bmax = np.maximum.reduceat(deltas, block_start)
    bmin = np.minimum.reduceat(deltas, block_start)
    full = block_count == BLOCK_SIZE
    alleq = full & (bmax == bmin)
    # small-delta blocks (full OR tail) become raw bytes — the per-block
    # codec choice that keeps the varint-era single-byte decode speed
    raw8 = ~alleq & (bmax < 256)
    headers[raw8] = _RAW8
    lengths[raw8] = 1 + block_count[raw8]
    # widths for full non-equal wide blocks
    widths = np.zeros(nb, dtype=np.int64)
    nz = full & ~alleq & ~raw8
    if nz.any():
        # bit length of per-block max (vectorized): 64 - clz
        mx = bmax[nz].astype(np.uint64)
        bl = np.zeros(mx.size, dtype=np.int64)
        v = mx.copy()
        while (v > 0).any():
            bl += (v > 0).astype(np.int64)
            v >>= np.uint64(1)
        bl = np.maximum(bl, 1)
        widths[nz] = bl
        headers[nz] = bl.astype(np.uint8)
        lengths[nz] = 1 + 16 * bl
    if alleq.any():
        headers[alleq] = 0
        vlen = np.searchsorted(
            _VARINT_BOUNDS,
            bmax[alleq].astype(np.uint64), side="right",
        ) + 1
        lengths[alleq] = 1 + vlen
    tail = ~full & ~raw8
    if tail.any():
        # one vectorized pass over the CONCATENATION of every wide tail in
        # the batch (the invert kernel encodes a whole flush's terms in one
        # call, so "at most one tail per term" still means thousands of
        # tails here — a per-tail python loop is the build hot path)
        headers[tail] = _TAIL
        ti = np.flatnonzero(tail)
        flat = _flat_ranges(block_start[ti], block_count[ti])
        vals = deltas[flat].astype(np.uint64)
        nb_ = np.searchsorted(
            _VARINT_BOUNDS,
            vals, side="right",
        ).astype(np.int64) + 1
        vstarts = np.concatenate(([0], np.cumsum(block_count[ti])[:-1]))
        lengths[ti] = 1 + np.add.reduceat(nb_, vstarts)
    return lengths, headers, widths


def _flat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Flat gather indices for the concatenation of [s, s+c) ranges."""
    total = int(counts.sum())
    excl = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.repeat(starts - excl, counts) + np.arange(total, dtype=np.int64)


def encode_stream(
    deltas: np.ndarray, block_start: np.ndarray, block_count: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """FOR-encode a flat delta stream cut into blocks -> (blob, offsets).

    `block_start`/`block_count` define each block's slice of `deltas`;
    offsets has nblocks+1 entries (byte offset of each block, then total).
    Vectorized: full blocks are packed per width group in one numpy pass."""
    deltas = np.asarray(deltas, dtype=np.uint64)
    nb = block_start.size
    if nb == 0:
        return b"", np.zeros(1, dtype=np.int64)
    lengths, headers, widths = encoded_block_lengths(
        deltas, block_start, block_count
    )
    offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    out[offsets[:-1]] = headers
    for w in np.unique(widths[widths > 0]):
        w = int(w)
        idx = np.flatnonzero(widths == w)
        vals = deltas[(block_start[idx][:, None]
                       + np.arange(BLOCK_SIZE, dtype=np.int64)).ravel()]
        packed = pack_blocks(vals.reshape(len(idx), BLOCK_SIZE), w)
        scatter = (
            offsets[idx][:, None] + 1 + np.arange(16 * w, dtype=np.int64)
        )
        out[scatter.ravel()] = packed.ravel()
    raw8 = np.flatnonzero(headers == _RAW8)
    if raw8.size:
        full8 = raw8[block_count[raw8] == BLOCK_SIZE]
        if full8.size:
            vals = deltas[
                (block_start[full8][:, None]
                 + np.arange(BLOCK_SIZE, dtype=np.int64)).ravel()
            ].astype(np.uint8)
            scatter = (
                offsets[full8][:, None]
                + 1
                + np.arange(BLOCK_SIZE, dtype=np.int64)
            )
            out[scatter.ravel()] = vals
        for i in raw8[block_count[raw8] < BLOCK_SIZE]:  # the (<=1) raw tail
            s, c = int(block_start[i]), int(block_count[i])
            out[offsets[i] + 1: offsets[i] + 1 + c] = deltas[s: s + c].astype(
                np.uint8
            )
    # all-equal blocks: tf=1 runs make these the COMMONEST tf-stream block,
    # so the single-varint-byte case writes as one vectorized scatter
    eq = np.flatnonzero(headers == 0)
    if eq.size:
        vals = deltas[block_start[eq]]
        one = vals < 128
        out[offsets[eq[one]] + 1] = vals[one].astype(np.uint8)
        for i in eq[~one]:  # multi-byte all-equal value: rare
            v = varint_encode(deltas[block_start[i]: block_start[i] + 1])
            out[offsets[i] + 1: offsets[i] + 1 + len(v)] = np.frombuffer(
                v, dtype=np.uint8
            )
    # wide varint tails: one vectorized LEB128 pass over the concatenation
    # of every tail in the batch, then one segmented scatter into out —
    # thousands of per-term python iterations otherwise (each term with
    # df < 128 and an absolute first-doc delta >= 256 lands here)
    tails = np.flatnonzero(headers == _TAIL)
    if tails.size:
        cnts = block_count[tails]
        flat = _flat_ranges(block_start[tails], cnts)
        blob, voff = varint_encode_with_offsets(deltas[flat])
        vb = np.frombuffer(blob, dtype=np.uint8)
        # per-tail byte span within blob = [voff[vstart], voff[vend])
        bnd = np.concatenate(([0], np.cumsum(cnts)))
        src_start = voff[bnd[:-1]]
        blens = voff[bnd[1:]] - src_start
        src = _flat_ranges(src_start, blens)
        dst = _flat_ranges(offsets[tails] + 1, blens)
        out[dst] = vb[src]
    return out.tobytes(), offsets


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing ints -> first value + successive deltas."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64)).astype(np.int64)


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray
) -> tuple[bytes, bytes, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Encode one term's (sorted local doc ids, tfs) with FOR blocks.

    Returns (docs_blob, tfs_blob, block_max_doc, block_max_tf,
    block_doc_boff, block_tf_boff); block arrays have one entry per 128-doc
    block (the block directory replacing Lucene's skip list,
    Lucene50SkipWriter.java:27-46); the *_boff arrays (len nblocks+1) are byte
    offsets of each block within the blob, enabling per-block random decode.
    Full blocks are bit-packed at the block max width (all-equal -> 1 value,
    ForUtil.java:41); the tail block is varint.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
    counts = np.minimum(n - starts, BLOCK_SIZE)
    docs_blob, doc_off = encode_stream(delta_encode(doc_ids), starts, counts)
    tfs_blob, tf_off = encode_stream(tfs.astype(np.uint64), starts, counts)
    pad = nblocks * BLOCK_SIZE - n
    bm_doc = np.pad(doc_ids, (0, pad), constant_values=doc_ids[-1] if n else 0)
    bm_tf = np.pad(tfs, (0, pad), constant_values=0)
    block_max_doc = bm_doc.reshape(nblocks, BLOCK_SIZE).max(axis=1).astype(np.int64)
    block_max_tf = bm_tf.reshape(nblocks, BLOCK_SIZE).max(axis=1).astype(np.int64)
    return (
        docs_blob,
        tfs_blob,
        block_max_doc,
        block_max_tf,
        doc_off,
        tf_off,
    )


def decode_postings(
    docs_blob: bytes, tfs_blob: bytes,
    doc_off: np.ndarray | None = None, tf_off: np.ndarray | None = None,
    df: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_postings -> (doc_ids int64, tfs int64).

    Offsets + df come from the posting row's block directory; when omitted
    (tests / ad-hoc use) the self-delimiting headers are walked instead."""
    if doc_off is None or tf_off is None or df is None:
        doc_off, df = _walk_offsets(docs_blob)
        tf_off, _ = _walk_offsets(tfs_blob)
    doc_ids = delta_decode(decode_stream(docs_blob, doc_off, df))
    tfs = decode_stream(tfs_blob, tf_off, df).astype(np.int64)
    return doc_ids, tfs


def _walk_offsets(blob: bytes) -> tuple[np.ndarray, int]:
    """Recover block offsets + total count by walking the block headers."""
    raw = np.frombuffer(blob, dtype=np.uint8)
    offs = [0]
    total = 0
    i = 0
    while i < raw.size:
        h = int(raw[i])
        if h == _TAIL:
            tail_vals = varint_decode(raw[i + 1:].tobytes())
            total += tail_vals.size
            i = raw.size
        elif h == _RAW8:
            if i + 1 + BLOCK_SIZE >= raw.size:  # final block: rest is values
                total += raw.size - i - 1
                i = raw.size
            else:  # non-final RAW8 blocks are always full
                total += BLOCK_SIZE
                i += 1 + BLOCK_SIZE
        elif h == 0:
            j = i + 1
            while raw[j] & 0x80:
                j += 1
            total += BLOCK_SIZE
            i = j + 1
        else:
            total += BLOCK_SIZE
            i += 1 + 16 * h
        offs.append(i)
    return np.asarray(offs, dtype=np.int64), total


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Per-doc position deltas, concatenated (Lucene50PostingsWriter.java:253-301).

    Position counts are recoverable from the tf stream, so no length headers.
    """
    if not positions_per_doc:
        return b""
    parts = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        d = np.empty_like(p)
        if p.size:
            d[0] = p[0]
            np.subtract(p[1:], p[:-1], out=d[1:])
        parts.append(d)
    return varint_encode(np.concatenate(parts).astype(np.uint64))


def encode_positions_flat(flat_abs: np.ndarray, tfs: np.ndarray) -> bytes:
    """Vectorized inverse of decode_positions_flat: encode a flat array of
    absolute positions (doc boundaries given by the tf stream) as per-doc
    restarted deltas in ONE numpy pass — no per-doc Python loop.  This is the
    hot-term merge path (a stopword-like term can carry millions of
    positions in one task); same segmented-delta trick as invert_flush."""
    tfs = np.asarray(tfs, dtype=np.int64)
    flat = np.asarray(flat_abs, dtype=np.int64)
    if flat.size == 0:
        return b""
    d = np.empty_like(flat)
    d[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=d[1:])
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    d[starts] = flat[starts]  # absolute restart at each doc's first position
    return varint_encode(d.astype(np.uint64))


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse of encode_positions given the tf (position-count) array."""
    tfs = np.asarray(tfs, dtype=np.int64)
    flat = varint_decode(pos_blob, count=int(tfs.sum()))
    out: list[np.ndarray] = []
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    for i in range(tfs.size):
        seg = flat[offsets[i]: offsets[i + 1]]
        out.append(np.cumsum(seg.astype(np.int64)))
    return out


def decode_positions_flat(pos_blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode -> (flat absolute positions, doc index per position).

    Avoids the per-doc Python loop of decode_positions for the query hot path:
    absolute position = cumsum(deltas) - cumsum at each doc start restart,
    done with a segmented-cumsum trick.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    flat = varint_decode(pos_blob, count=total).astype(np.int64)
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    doc_idx = np.repeat(np.arange(tfs.size, dtype=np.int64), tfs)
    csum = np.cumsum(flat)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    # subtract the cumulative total before each doc's first position;
    # docs starting at flat index 0 (including any zero-tf prefix — a
    # starts[i]-1 index would wrap to csum[-1]) have nothing before them
    base = np.where(starts > 0, csum[np.maximum(starts - 1, 0)], 0)
    abs_pos = csum - np.repeat(base, tfs)
    return abs_pos, doc_idx


# ---------------------------------------------------------------------------
# per-doc stored token offsets (the ..._AND_OFFSETS IndexOptions analog,
# IndexOptions.java:36-53).  Lucene interleaves offsets with positions in the
# postings (Lucene50PostingsWriter.java:253-301); the Spark-native
# re-expression stores ONE offsets record per document on its kind=doc row,
# indexed by pre-stop token ordinal — positions are pre-stop ordinals, so
# offset_of[position] recovers exactly what the interleaved form gives, with
# no postings-codec change and no merge rewrite (doc rows are merge-stable).
# ---------------------------------------------------------------------------


def encode_doc_offsets(
    starts: np.ndarray, ends: np.ndarray, counts: np.ndarray
) -> list[bytes | None]:
    """Per-doc offset blobs from flat (start, end) char-offset arrays.

    `counts[i]` = pre-stop token count of doc i (0 = offsets unavailable —
    e.g. the non-ASCII regex fallback path — encoded as None).  Blob layout:
    varint(n) ++ varint restarted-deltas of starts ++ same of ends; both
    sequences are strictly increasing per doc, so this reuses the positions
    delta form.  Fully vectorized: one varint pass per stream, per-doc byte
    ranges from reduceat — no per-value Python.
    """
    counts = np.asarray(counts, dtype=np.int64)
    n_docs = counts.size
    if int(counts.sum()) == 0:
        return [None] * n_docs
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)

    def _restart_deltas(flat: np.ndarray) -> np.ndarray:
        d = np.empty_like(flat)
        d[0] = flat[0]
        np.subtract(flat[1:], flat[:-1], out=d[1:])
        doc_first = np.concatenate(([0], np.cumsum(counts)[:-1]))
        nz = counts > 0
        d[doc_first[nz]] = flat[doc_first[nz]]
        return d

    sblob, soff = varint_encode_with_offsets(
        _restart_deltas(starts).astype(np.uint64))
    eblob, eoff = varint_encode_with_offsets(
        _restart_deltas(ends).astype(np.uint64))
    hdr_blob, hoff = varint_encode_with_offsets(counts.astype(np.uint64))
    bounds = np.concatenate(([0], np.cumsum(counts)))
    mv_s, mv_e, mv_h = memoryview(sblob), memoryview(eblob), memoryview(hdr_blob)
    out: list[bytes | None] = []
    for i in range(n_docs):
        if counts[i] == 0:
            out.append(None)
            continue
        lo, hi = int(soff[bounds[i]]), int(soff[bounds[i + 1]])
        elo, ehi = int(eoff[bounds[i]]), int(eoff[bounds[i + 1]])
        out.append(bytes(mv_h[hoff[i]:hoff[i + 1]]) + bytes(mv_s[lo:hi])
                   + bytes(mv_e[elo:ehi]))
    return out


def decode_doc_offsets(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_doc_offsets for one doc -> (starts, ends)."""
    vals = varint_decode(blob)  # [n, start deltas..., end deltas...]
    n = int(vals[0])
    starts = np.cumsum(vals[1:1 + n].astype(np.int64))
    ends = np.cumsum(vals[1 + n:1 + 2 * n].astype(np.int64))
    return starts, ends
