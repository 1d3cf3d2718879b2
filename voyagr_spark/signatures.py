"""Signature-based ingest dedup — the reference's own dedup-at-update story.

Re-expresses solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java (processAdd:133-196) Spark-first:

* the processor computes one signature per document over a sorted field
  list — `sig.add(fieldName); sig.add(String.valueOf(value))` per present
  field (SignatureUpdateProcessorFactory.java:155-174) — hex-encodes it
  (lowercase, :176-185) and, with overwriteDupes=true, sets
  ``cmd.updateTerm = Term(signatureField, sig)`` (:188-190) so a newer doc
  with the same signature REPLACES the older one (updateDocument by
  signature term).
* three Signature impls ship with the reference:
  - MD5Signature.java: plain MD5 over the concatenated UTF-8 stream;
  - Lookup3Signature.java: 64-bit lookup3ycs64 fold
    (solr/solrj/.../common/util/Hash.java:184-240 — Bob Jenkins' lookup3
    hashlittle2 with the code-point-length bias removed), each add()
    chaining the previous hash as initval;
  - TextProfileSignature.java (from Apache Nutch): MD5 of a quantized
    token-frequency profile — the fuzzy near-dup signature.

Spark shapes (100 TB honest): md5/text-profile are pure JVM expressions —
md5 is one projection, text-profile is one (doc, token) count shuffle plus
one per-doc re-group, identical to the tokenize/minhash ops next door; no
Python in either. Lookup3 is a sequential 32-bit mix chain with no SQL
analog, so it runs as an Arrow-batched pandas UDF (per-doc scalar work,
embarrassingly parallel). Dedup-by-signature is one window over the
signature key.

Known divergence (documented like classify's tie order): the reference
sorts the text profile by count desc ONLY — ties keep HashMap iteration
order (TextProfileSignature.java:157-162), which is JVM-internal and
non-deterministic across runs. Here ties break token-asc, deterministic
across engines and cluster sizes; the oracle states the same order.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_M32 = 0xFFFFFFFF

# ---------------------------------------------------------------------------
# lookup3 family (Hash.java) — pure-Python 32-bit-wrap port, validated in
# tests against the C-version golden vectors the reference ships in
# solr/solrj/src/test/org/apache/solr/common/util/TestHash.java:30.
# ---------------------------------------------------------------------------


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M32


def _mix(a: int, b: int, c: int):
    a = (a - c) & _M32; a ^= _rot(c, 4);  c = (c + b) & _M32
    b = (b - a) & _M32; b ^= _rot(a, 6);  a = (a + c) & _M32
    c = (c - b) & _M32; c ^= _rot(b, 8);  b = (b + a) & _M32
    a = (a - c) & _M32; a ^= _rot(c, 16); c = (c + b) & _M32
    b = (b - a) & _M32; b ^= _rot(a, 19); a = (a + c) & _M32
    c = (c - b) & _M32; c ^= _rot(b, 4);  b = (b + a) & _M32
    return a, b, c


def _final(a: int, b: int, c: int):
    c ^= b; c = (c - _rot(b, 14)) & _M32
    a ^= c; a = (a - _rot(c, 11)) & _M32
    b ^= a; b = (b - _rot(a, 25)) & _M32
    c ^= b; c = (c - _rot(b, 16)) & _M32
    a ^= c; a = (a - _rot(c, 4)) & _M32
    b ^= a; b = (b - _rot(a, 14)) & _M32
    c ^= b; c = (c - _rot(b, 24)) & _M32
    return a, b, c


def lookup3(k: list[int], offset: int, length: int, initval: int) -> int:
    """Hash.java:59-104 (Bob Jenkins' hashword). Returns unsigned 32-bit."""
    a = b = c = (0xDEADBEEF + ((length << 2) & _M32) + (initval & _M32)) & _M32
    i = offset
    while length > 3:
        a = (a + k[i]) & _M32
        b = (b + k[i + 1]) & _M32
        c = (c + k[i + 2]) & _M32
        a, b, c = _mix(a, b, c)
        length -= 3
        i += 3
    if length == 3:
        c = (c + k[i + 2]) & _M32
    if length >= 2:
        b = (b + k[i + 1]) & _M32
    if length >= 1:
        a = (a + k[i]) & _M32
        a, b, c = _final(a, b, c)
    return c


def lookup3ycs(k: list[int], offset: int, length: int, initval: int) -> int:
    """Hash.java:113-115: lookup3 with the length bias removed."""
    return lookup3(k, offset, length, (initval - (length << 2)) & _M32)


def lookup3ycs64(s: str, initval: int = 0) -> int:
    """Hash.java:184-240 (lookup3ycs64 over a char sequence).

    Java iterates UTF-16 units pairing surrogates into code points; Python
    strings ARE code points, so plain iteration is the same stream.
    Returns the unsigned 64-bit value of Java's ``c + (((long)b) << 32)``."""
    a = b = c0 = (0xDEADBEEF + (initval & _M32)) & _M32
    c = (c0 + ((initval >> 32) & _M32)) & _M32
    cps = [ord(ch) for ch in s]
    i, n = 0, len(cps)
    mixed = True
    while i < n:
        mixed = False
        a = (a + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        b = (b + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        c = (c + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        a, b, c = _mix(a, b, c)
        mixed = True
    if not mixed:
        a, b, c = _final(a, b, c)
    return (c + (b << 32)) & 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Signature computation over a DataFrame (the processAdd loop, batch form)
# ---------------------------------------------------------------------------

#: documents-table fields the gates sign, pre-sorted like the factory
#: (SignatureUpdateProcessorFactory.java:71 Collections.sort(sigFields)).
DEFAULT_SIG_FIELDS = ["lang", "source", "text"]


def _sig_stream_cols(df: DataFrame, fields: list[str] | None):
    """The factory's digest stream: for each present field in sorted name
    order, the field NAME then String.valueOf(value) — nulls (absent
    SolrInputFields) contribute nothing (:156-174)."""
    fields = sorted(fields if fields is not None else DEFAULT_SIG_FIELDS)
    parts = []
    for f_ in fields:
        parts.append(
            F.when(F.col(f_).isNotNull(),
                   F.concat(F.lit(f_), F.col(f_).cast("string")))
            .otherwise(F.lit(""))
        )
    return fields, F.concat(*parts) if len(parts) > 1 else parts[0]


def with_md5_signature(df: DataFrame, fields: list[str] | None = None,
                       out: str = "sig") -> DataFrame:
    """MD5Signature.java: MD5 over the concatenated UTF-8 field stream,
    lowercase hex like the factory's HEX_DIGITS encode (:176-185).
    One JVM-side projection — no shuffle, no Python."""
    _, stream = _sig_stream_cols(df, fields)
    return df.withColumn(out, F.md5(stream))


def with_lookup3_signature(df: DataFrame, fields: list[str] | None = None,
                           out: str = "sig") -> DataFrame:
    """Lookup3Signature.java: hash = lookup3ycs64(content, prev_hash)
    folded over the same (name, value) stream; 8 big-endian bytes, hex.

    The 32-bit mix chain is inherently sequential per doc and has no SQL
    form — Arrow-batched pandas UDF, per-doc scalar cost."""
    fields = sorted(fields if fields is not None else DEFAULT_SIG_FIELDS)

    @pandas_udf(T.StringType())
    def _l3(*cols: pd.Series) -> pd.Series:
        outv = []
        for row in zip(*cols):
            h = 0
            for name, val in zip(fields, row):
                if val is None:
                    continue
                h = lookup3ycs64(name, h)
                h = lookup3ycs64(str(val), h)
            outv.append("%016x" % h)
        return pd.Series(outv)

    return df.withColumn(out, _l3(*[F.col(f_) for f_ in fields]))


def with_text_profile_signature(df: DataFrame, field: str = "text",
                                quant_rate: float = 0.01,
                                min_token_len: int = 2,
                                id_col: str = "doc_id",
                                out: str = "sig") -> DataFrame:
    """TextProfileSignature.java (the Nutch near-dup profile):

    1. tokens = maximal letter-or-digit runs of the lowercased text
       (Character.isLetterOrDigit char loop == split on [^\\p{L}\\p{Nd}]+),
       kept iff length > min_token_len (:81,:97 — strictly greater);
    2. quant = Math.round(maxFreq * quantRate) as FLOAT math (:112), floored
       to 2 when maxFreq > 1 else 1 (:113-117);
    3. per-token count rounded down to a quant multiple, dropped below
       quant (:119-126);
    4. profile lines "token count" sorted by count desc (tie: token asc —
       documented divergence from HashMap order), joined by \\n (:128-137);
    5. signature = MD5 of the profile string (possibly empty).

    Shape: one (doc, token) count shuffle + one per-doc regroup; the
    profile fold is all JVM array expressions."""
    toks = df.select(
        id_col,
        F.explode(
            F.split(F.lower(F.col(field)), r"[^\p{L}\p{Nd}]+")
        ).alias("tok"),
    ).filter(F.length("tok") > min_token_len)
    cnts = toks.groupBy(id_col, "tok").agg(
        F.count("*").cast("int").alias("cnt"))
    prof = cnts.groupBy(id_col).agg(
        F.collect_list(F.struct("cnt", "tok")).alias("ts"))

    maxf = F.array_max(F.transform("ts", lambda t: t["cnt"]))
    # Math.round(float) == floor(x + 0.5) for the positive values here;
    # the multiply happens in float32 like Java's int * float promotion
    raw_q = F.floor(
        (maxf.cast("float") * F.lit(quant_rate).cast("float"))
        .cast("float") + F.lit(0.5)
    ).cast("int")
    quant = F.when(raw_q < 2, F.when(maxf > 1, F.lit(2)).otherwise(F.lit(1))
                   ).otherwise(raw_q)

    prof = prof.withColumn("quant", quant)
    q = F.col("quant")
    kept = F.filter(
        F.transform(
            "ts",
            lambda t: F.struct(
                (F.floor(t["cnt"] / q) * q).cast("int").alias("cnt"),
                t["tok"].alias("tok"),
            ),
        ),
        lambda t: t["cnt"] >= q,
    )
    ordered = F.array_sort(
        kept,
        lambda l, r: F.when(l["cnt"] > r["cnt"], F.lit(-1))
        .when(l["cnt"] < r["cnt"], F.lit(1))
        .when(l["tok"] < r["tok"], F.lit(-1))
        .when(l["tok"] > r["tok"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    profile = F.array_join(
        F.transform(ordered,
                    lambda t: F.concat(t["tok"], F.lit(" "),
                                       t["cnt"].cast("string"))),
        "\n",
    )
    prof = prof.select(id_col, F.md5(profile).alias(out))
    # docs whose every token was discarded (or that had no tokens) still
    # get a signature: MD5 of the empty profile, like the Java code
    return (
        df.select(id_col)
        .join(prof, id_col, "left")
        .withColumn(out, F.coalesce(F.col(out), F.lit(_EMPTY_MD5)))
    )


_EMPTY_MD5 = hashlib.md5(b"").hexdigest()


def text_profile_py(content: str, quant_rate: float = 0.01,
                    min_token_len: int = 2) -> str:
    """Scalar reference oracle for tests: the TextProfileSignature.add
    loop transliterated (used only to cross-check the distributed form)."""
    import re

    import numpy as np

    tokens: dict[str, int] = {}
    max_freq = 0
    for tok in re.split(r"[\W_]+", content.lower(), flags=re.UNICODE):
        if len(tok) > min_token_len:
            tokens[tok] = tokens.get(tok, 0) + 1
            max_freq = max(max_freq, tokens[tok])
    # Java Math.round(float) == floor(x + 0.5)
    quant = int(np.floor(np.float32(max_freq) * np.float32(quant_rate)
                         + np.float32(0.5)))
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    prof = []
    for tok, cnt in tokens.items():
        cnt = (cnt // quant) * quant
        if cnt >= quant:
            prof.append((cnt, tok))
    prof.sort(key=lambda t: (-t[0], t[1]))
    text = "\n".join(f"{tok} {cnt}" for cnt, tok in prof)
    return hashlib.md5(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# overwriteDupes: newest doc per signature wins (updateTerm semantics)
# ---------------------------------------------------------------------------


def dedup_by_signature(df: DataFrame, sig_col: str = "sig",
                       id_col: str = "doc_id") -> DataFrame:
    """overwriteDupes=true (:188-190): each add is an updateDocument keyed
    by the signature term, so after a batch the LAST writer per signature
    is live. Batch analog: keep max(id) per signature + how many older
    copies it overwrote. One window over the signature key."""
    w = Window.partitionBy(sig_col)
    return (
        df.withColumn("kept_doc", F.max(id_col).over(w))
        .withColumn("n_overwritten", (F.count("*").over(w) - 1))
        .filter(F.col(id_col) == F.col("kept_doc"))
        .select(sig_col, "kept_doc", "n_overwritten")
    )


# ---------------------------------------------------------------------------
# (spark, sf_dir) gate surfaces
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def md5_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_md5_signature(_docs(spark, sf_dir)).select("doc_id", "sig")


def text_profile_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_text_profile_signature(_docs(spark, sf_dir))


def dedup_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end processor analog: sign (md5 over lang+source+text minus
    doc-unique noise would dedup nothing at sf0.01, so the gate signs the
    text profile — the fuzzy signature the reference aims at near-dups)
    then keep the newest doc per signature."""
    signed = with_text_profile_signature(_docs(spark, sf_dir))
    return dedup_by_signature(signed)


def lookup3_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_lookup3_signature(_docs(spark, sf_dir)).select("doc_id", "sig")
