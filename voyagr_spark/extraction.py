"""Content-extraction handler analog, Spark-first (reference contrib
`solr/contrib/extraction` — the "Solr Cell" Tika integration).

Reference semantics re-expressed (not ported):

* `ExtractingDocumentLoader.java:120-180` — a binary stream goes through
  type detection, then a parser turns it into text + metadata, and the
  result is mapped onto document fields.
* `SolrContentHandler.java:60-120` — metadata entries become fields
  (``stream_size``, ``content_type``, ...), literal params
  (`ExtractingParams.LITERALS_PREFIX`) add constant fields, and
  `fmap.*` renames extracted fields.

The container has no Tika, so the parser slot holds two honest public
equivalents rather than a stub:

* **type detection** by magic bytes (the Tika `Detector` contract):
  RIFF/WAVE, PPM `P6`, PNG, else UTF-8-decodable printable -> text/plain,
  else application/octet-stream.
* **text extraction** by printable-run scanning (the classic
  ``strings(1)`` form, Tika's fallback for unknown binaries): maximal
  runs of printable ASCII bytes of length >= ``min_run`` joined by a
  single space.

Spark-first shape: extraction is one `mapInPandas` pass over the binary
column — Arrow-batched, no shuffle, no driver involvement; the regex
run-scan is C-rate per document.  Typed media decode (WAV/PPM feature
extraction) stays in `pipeline.extract_features`; this module is the
ingest-side text+metadata mapping.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sniff_type", "extract_text_bytes", "extract"]

#: minimum printable-run length kept (strings(1) default)
MIN_RUN = 4

_RUN_RE = re.compile(rb"[\x20-\x7e]{%d,}" % MIN_RUN)

#: magic-byte table (Tika MimeTypes detection, subset present in-tree)
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_type(b: bytes) -> str:
    """Magic-byte content-type detection (the Tika Detector contract)."""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/x-wav"
    if b[:2] == b"P6" and b[2:3] in (b"\n", b" ", b"\t", b"\r"):
        return "image/x-portable-pixmap"
    if b[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return "image/png"
    try:
        s = b.decode("utf-8")
    except UnicodeDecodeError:
        return "application/octet-stream"
    if s and all(ch >= " " or ch in "\t\r\n" for ch in s):
        return "text/plain"
    return "application/octet-stream"


def extract_text_bytes(b: bytes, min_run: int = MIN_RUN) -> str:
    """Printable-run text extraction (strings(1); Tika's fallback text
    for unknown binaries): maximal runs of printable ASCII bytes of
    length >= min_run, joined by one space."""
    if min_run == MIN_RUN:
        runs = _RUN_RE.findall(b)
    else:
        runs = re.findall(rb"[\x20-\x7e]{%d,}" % min_run, b)
    return " ".join(r.decode("ascii") for r in runs)


def extract(
    df: DataFrame,
    bin_col: str = "data",
    id_cols: tuple = ("doc_id",),
    literals: Optional[dict] = None,
    fmap: Optional[dict] = None,
    min_run: int = MIN_RUN,
) -> DataFrame:
    """ExtractingDocumentLoader.load: binary stream -> (content_type,
    text, stream_size) fields plus literal constants, with `fmap`
    renames.  One Arrow-batched mapInPandas pass, no shuffle."""
    literals = dict(literals or {})
    fmap = dict(fmap or {})
    base = {"content_type": "content_type", "text": "text",
            "stream_size": "stream_size"}
    for k in fmap:
        if k not in base:
            raise ValueError(f"fmap source '{k}' is not an extracted field")
    out_names = {k: fmap.get(k, v) for k, v in base.items()}

    in_fields = [df.schema[c] for c in id_cols]
    schema = T.StructType(
        in_fields
        + [
            T.StructField(out_names["content_type"], T.StringType()),
            T.StructField(out_names["text"], T.StringType()),
            T.StructField(out_names["stream_size"], T.LongType()),
        ]
        + [T.StructField(k, T.StringType()) for k in sorted(literals)]
    )
    lit_items = sorted(literals.items())
    cols = list(id_cols) + [bin_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[bin_col]
            out = pdf[list(id_cols)].copy()
            out[out_names["content_type"]] = [
                sniff_type(bytes(b)) for b in blobs
            ]
            out[out_names["text"]] = [
                extract_text_bytes(bytes(b), min_run) for b in blobs
            ]
            out[out_names["stream_size"]] = [len(bytes(b)) for b in blobs]
            for k, v in lit_items:
                out[k] = v
            yield out

    return df.select(*cols).mapInPandas(run, schema=schema)
