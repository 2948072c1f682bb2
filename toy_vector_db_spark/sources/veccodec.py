"""Binary ``.vec`` codec — byte-level interop with the reference's file
store (one encoded vector per ``<id>.vec`` file).

Format (reference pkg/core/vector/vector.go:90-177 Encode/Decode; file
naming pkg/storage/storage.go:248,280):

    u32 LE  id length            | id bytes (utf-8)
    u32 LE  dimension            | dimension x f32 LE values
    u32 LE  metadata length      | metadata bytes

Metadata is ``k1=v1;k2=v2`` with ``=``/``;`` escaped by a backslash
(vector.go:180-200). Two reference quirks mirrored deliberately:

- Go map iteration makes the reference's pair ORDER nondeterministic;
  we emit keys sorted (same fix as the JSON processor, SURVEY §2.7
  F12). The reference's decoder accepts any order, so sorted output is
  fully interoperable.
- The escape scanner (vector.go:228-254) drops a backslash before ANY
  character — and it runs FIRST on the ';' split, so by the time pairs
  are split on '=', formerly-escaped '=' chars are unprotected: any
  key/value containing '=' makes its pair split 3-way and the
  reference's decoder silently drops it (:214-216). ';' inside values
  survives (it is protected in the pass that splits on ';'); literal
  backslashes are consumed. We reproduce this decode behavior
  bit-for-bit rather than "fixing" an on-disk format we don't own —
  metadata that must round-trip losslessly belongs in parquet.

Scale note: one-file-per-vector is the reference's layout, kept ONLY
for import/export interop. ``read_vec_dir`` decodes distributed (Spark
``binaryFile`` source -> Arrow-batched decode, so millions of files
still scan in parallel); ``write_vec_dir`` exists to hand data BACK to
the reference and warns in its docstring that parquet is the native
layout at scale.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

VEC_EXT = ".vec"


def _escape(s: str) -> str:
    return s.replace("=", "\\=").replace(";", "\\;")


def encode_metadata(metadata: dict[str, str] | None) -> str:
    """``k1=v1;k2=v2`` with escaped delimiters; keys sorted for
    determinism (vector.go:180-200 modulo Go map order)."""
    if not metadata:
        return ""
    return ";".join(f"{_escape(k)}={_escape(v)}"
                    for k, v in sorted(metadata.items()))


def _split_escaped(s: str, delim: str) -> list[str]:
    """Split on unescaped ``delim``; a backslash escapes (and is
    dropped before) ANY next character — exact mirror of
    vector.go:228-254 splitRespectingEscapes."""
    out, cur, escaped = [], [], False
    for c in s:
        if escaped:
            cur.append(c)
            escaped = False
        elif c == "\\":
            escaped = True
        elif c == delim:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur or not s:
        out.append("".join(cur))
    return out


def decode_metadata(s: str) -> dict[str, str]:
    """Inverse of encode_metadata (vector.go:203-226): pairs that do
    not split into exactly key=value are silently dropped, like the
    reference."""
    result: dict[str, str] = {}
    if not s:
        return result
    for pair in _split_escaped(s, ";"):
        kv = _split_escaped(pair, "=")
        if len(kv) == 2:
            result[kv[0]] = kv[1]
    return result


def encode_vector(vec_id: str, values, metadata: dict[str, str] | None = None
                  ) -> bytes:
    """Serialize one vector to the reference's byte layout
    (vector.go:90-124). Values are stored float32 LE."""
    idb = vec_id.encode("utf-8")
    mb = encode_metadata(metadata).encode("utf-8")
    vals = [float(x) for x in (values or [])]
    return (struct.pack("<I", len(idb)) + idb
            + struct.pack("<I", len(vals))
            + struct.pack(f"<{len(vals)}f", *vals)
            + struct.pack("<I", len(mb)) + mb)


def decode_vector(buf: bytes) -> tuple[str, list[float], dict[str, str]]:
    """Deserialize (vector.go:126-177), with the reference's exact
    bounds behavior: short buffers error; a missing/truncated metadata
    section decodes as an empty map (the reference only reads metadata
    when the full declared length is present)."""
    if len(buf) < 8:
        raise ValueError("buffer too small to decode vector")
    (id_len,) = struct.unpack_from("<I", buf, 0)
    if len(buf) < 4 + id_len + 4:
        raise ValueError("buffer too small to decode vector")
    vec_id = buf[4:4 + id_len].decode("utf-8")
    (dim,) = struct.unpack_from("<I", buf, 4 + id_len)
    off = 4 + id_len + 4
    if len(buf) < off + 4 * dim:
        raise ValueError("buffer too small to decode vector values")
    values = list(struct.unpack_from(f"<{dim}f", buf, off))
    moff = off + 4 * dim
    metadata: dict[str, str] = {}
    if len(buf) > moff + 4:
        (mlen,) = struct.unpack_from("<I", buf, moff)
        if len(buf) >= moff + 4 + mlen:
            metadata = decode_metadata(
                buf[moff + 4:moff + 4 + mlen].decode("utf-8"))
    return vec_id, values, metadata


def read_vec_dir(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference file-store directory as a vectors DataFrame
    (id, embedding ARRAY<FLOAT>, metadata MAP<STRING,STRING>).

    Distributed end to end: the built-in ``binaryFile`` source lists
    and reads the ``*.vec`` files across executors; decoding runs as an
    Arrow-batched mapInPandas over (path, content) — no driver loop, so
    a store with millions of files still imports in parallel."""
    import pandas as pd

    src = (spark.read.format("binaryFile")
           .option("pathGlobFilter", f"*{VEC_EXT}")
           .load(path)
           .select("content"))

    def decode(batches):
        for pdf in batches:
            rows = [decode_vector(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame({
                "id": [r[0] for r in rows],
                "embedding": [r[1] for r in rows],
                "metadata": [r[2] for r in rows],
            })

    return src.mapInPandas(
        decode, "id string, embedding array<float>, metadata map<string,string>")


def _check_vec_id(vec_id: str) -> str:
    """Reject ids that would escape the export directory when joined
    into a filename (path separators, '..', empty). The reference keys
    files by raw id the same way (storage.go:280) with the same hazard;
    we fail loudly instead of writing outside ``path``."""
    if (not vec_id or "/" in vec_id or "\\" in vec_id
            or vec_id in (".", "..") or "\x00" in vec_id):
        raise ValueError(f"vector id not usable as a filename: {vec_id!r}")
    return vec_id


def write_vec_dir(df: DataFrame, path: str,
                  id_col: str = "id", vec_col: str = "embedding",
                  meta_col: str = "metadata") -> int:
    """Export a vectors DataFrame as a reference-readable file store:
    one ``<id>.vec`` per row (storage.go:280). Executor-parallel
    (foreachPartition); the one-file-per-vector layout is the
    REFERENCE'S scale ceiling, not ours — use parquet for anything but
    hand-off. Returns the row count, tallied inside the write pass by
    an accumulator (no second scan of ``df``).

    REQUIRES a filesystem shared between executors and the caller
    (local mode, NFS, or a FUSE-mounted object store): files are
    written with plain ``open()`` on whichever host runs the partition.
    On a cluster without shared storage, export to parquet instead and
    convert on the consuming host. Ids containing path separators or
    ``..`` are rejected (they would escape ``path``); distinct rows
    with the same id overwrite one file, matching reference semantics
    (last write wins)."""
    os.makedirs(path, exist_ok=True)
    cols = df.select(id_col, vec_col, meta_col)
    n_written = cols.sparkSession.sparkContext.accumulator(0)

    def write_part(rows):
        n = 0
        for r in rows:
            vid = _check_vec_id(str(r[0]))
            buf = encode_vector(vid, r[1] or [], dict(r[2] or {}))
            with open(os.path.join(path, f"{vid}{VEC_EXT}"), "wb") as f:
                f.write(buf)
            n += 1
        n_written.add(n)

    cols.foreachPartition(write_part)
    return n_written.value
