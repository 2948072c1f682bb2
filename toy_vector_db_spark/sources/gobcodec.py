"""Go ``encoding/gob`` interop for the reference's index snapshots.

The reference persists whole indexes with Go's gob serialization:

- flat:  ``indexData{Vectors map[string]*Vector; Metric string}``
  (/root/reference/pkg/index/flat/flat.go:168-246)
- HNSW:  ``indexData{Nodes map[string]*Node; EntryPoint string;
  CurrentMaxLevel int; Config HNSWConfig; Metric string}`` with
  ``Node{Vector *Vector; Edges []map[string]float32; Level int;
  Deleted bool}`` (hnsw.go:556-652, node struct :56-61)
- ``Vector{ID string; Values []float32; Dimension int;
  Metadata map[string]string}`` (pkg/core/vector/vector.go:18-23)

Gob is a PUBLIC, fully documented, self-describing format (Go docs,
``encoding/gob``): a stream of length-prefixed messages, each either a
type definition (negative type id + a ``wireType`` value) or a value
(positive type id + the value). This module implements

- a generic DECODER: parses the embedded type definitions and decodes
  any gob value into plain Python dicts/lists — so both snapshot
  layouts (and future ones) import without hardcoding wire ids;
- an ENCODER for the flat-index shape, so an index exported here loads
  in the reference (gob matches struct fields by NAME, so only the
  field names must agree, which they do).

Wire primitives (from the public spec): unsigned ints are one byte if
< 128, else a negative byte count followed by big-endian bytes; signed
ints put the sign in bit 0; floats are float64 bit patterns
byte-REVERSED then sent as unsigned (so low zero bytes drop); strings
and byte slices are count+bytes; slices are count+elements; maps are
count+alternating key/value; structs are (field-delta, value) pairs
ending with delta 0, zero-valued fields omitted.

The decoder is anchored to the worked ``struct Point{X, Y int}``
example in the Go documentation byte-for-byte
(tests/test_gobcodec.py::test_point_example_from_go_docs).

Scale note: a gob file is a single sequential stream — the reference's
single-node artifact, same class as the ``.vec`` store. Import parses
on the driver and parallelizes the RESULT (createDataFrame); export
streams rows with toLocalIterator (no full materialization). For
engine-native persistence use the partitioned parquet layouts; this
codec exists for hand-off with the reference only.
"""

from __future__ import annotations

import struct as _struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession

# builtin wire type ids (encoding/gob/type.go — public API constants)
BOOL, INT, UINT, FLOAT, BYTES, STRING, COMPLEX, INTERFACE = range(1, 9)
WIRE_TYPE, ARRAY_T, COMMON_T, SLICE_T, STRUCT_T, FIELD_T = 16, 17, 18, 19, 20, 21
FIELD_SLICE_T, MAP_T = 22, 23
_FIRST_USER_ID = 65


# ---------------------------------------------------------------------------
# primitive reader / writer
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("gob: truncated stream")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_uint(self) -> int:
        b = self.take(1)[0]
        if b < 128:
            return b
        n = 256 - b
        if n > 8:
            raise ValueError(f"gob: uint byte count {n} > 8")
        return int.from_bytes(self.take(n), "big")

    def read_int(self) -> int:
        u = self.read_uint()
        return ~(u >> 1) if u & 1 else u >> 1

    def read_float(self) -> float:
        # wire float = float64 bit pattern byte-REVERSED, sent as uint
        # (leading zeros of the reversed form drop out of the varint)
        u = self.read_uint()
        return _struct.unpack(">d", u.to_bytes(8, "big")[::-1])[0]

    def read_string(self) -> str:
        return self.take(self.read_uint()).decode("utf-8")

    def read_bytes(self) -> bytes:
        return self.take(self.read_uint())


def _enc_uint(u: int) -> bytes:
    if u < 128:
        return bytes([u])
    raw = u.to_bytes((u.bit_length() + 7) // 8, "big")
    return bytes([256 - len(raw)]) + raw


def _enc_int(i: int) -> bytes:
    return _enc_uint((~i << 1) | 1 if i < 0 else i << 1)


def _enc_float(f: float) -> bytes:
    rev = _struct.pack(">d", float(f))[::-1]
    return _enc_uint(int.from_bytes(rev, "big"))


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _enc_uint(len(raw)) + raw


# ---------------------------------------------------------------------------
# generic decoder
# ---------------------------------------------------------------------------


class GobDecoder:
    """Decode a gob stream into Python values: structs -> dicts keyed by
    field name (zero/omitted fields absent), slices -> lists, maps ->
    dicts, scalars -> int/float/bool/str/bytes."""

    def __init__(self, buf: bytes):
        self.r = _Reader(buf)
        self.types: dict[int, dict] = {}

    # -- type definitions ------------------------------------------------

    def _read_common(self) -> dict:
        out = {"name": "", "id": 0}
        field = -1
        while True:
            delta = self.r.read_uint()
            if delta == 0:
                return out
            field += delta
            if field == 0:
                out["name"] = self.r.read_string()
            elif field == 1:
                out["id"] = self.r.read_int()
            else:
                raise ValueError("gob: bad commonType field")

    def _read_fields(self) -> list[tuple[str, int]]:
        n = self.r.read_uint()
        fields = []
        for _ in range(n):
            name, tid, field = "", 0, -1
            while True:
                delta = self.r.read_uint()
                if delta == 0:
                    break
                field += delta
                if field == 0:
                    name = self.r.read_string()
                elif field == 1:
                    tid = self.r.read_int()
                else:
                    raise ValueError("gob: bad fieldType field")
            fields.append((name, tid))
        return fields

    def _read_wire_type(self) -> dict:
        """One wireType value: exactly one of its pointer fields is set.
        Field order (encoding/gob/type.go wireType struct): ArrayT 0,
        SliceT 1, StructT 2, MapT 3, GobEncoderT 4, BinaryMarshalerT 5,
        TextMarshalerT 6."""
        out: dict = {}
        field = -1
        while True:
            delta = self.r.read_uint()
            if delta == 0:
                return out
            field += delta
            if field == 0:      # arrayType {common, Elem, Len}
                c, elem, ln, f = {}, 0, 0, -1
                while True:
                    d = self.r.read_uint()
                    if d == 0:
                        break
                    f += d
                    if f == 0:
                        c = self._read_common()
                    elif f == 1:
                        elem = self.r.read_int()
                    else:
                        ln = self.r.read_int()
                out.update(kind="array", common=c, elem=elem, len=ln)
            elif field == 1:    # sliceType {common, Elem}
                c, elem, f = {}, 0, -1
                while True:
                    d = self.r.read_uint()
                    if d == 0:
                        break
                    f += d
                    if f == 0:
                        c = self._read_common()
                    else:
                        elem = self.r.read_int()
                out.update(kind="slice", common=c, elem=elem)
            elif field == 2:    # structType {common, Field []fieldType}
                c, fields, f = {}, [], -1
                while True:
                    d = self.r.read_uint()
                    if d == 0:
                        break
                    f += d
                    if f == 0:
                        c = self._read_common()
                    else:
                        fields = self._read_fields()
                out.update(kind="struct", common=c, fields=fields)
            elif field == 3:    # mapType {common, Key, Elem}
                c, key, elem, f = {}, 0, 0, -1
                while True:
                    d = self.r.read_uint()
                    if d == 0:
                        break
                    f += d
                    if f == 0:
                        c = self._read_common()
                    elif f == 1:
                        key = self.r.read_int()
                    else:
                        elem = self.r.read_int()
                out.update(kind="map", common=c, key=key, elem=elem)
            else:
                raise ValueError(
                    f"gob: unsupported wireType field {field} "
                    "(GobEncoder-based types not supported)")

    # -- values ----------------------------------------------------------

    def _decode_value(self, tid: int) -> Any:
        if tid == BOOL:
            return self.r.read_uint() != 0
        if tid == INT:
            return self.r.read_int()
        if tid == UINT:
            return self.r.read_uint()
        if tid == FLOAT:
            return self.r.read_float()
        if tid == BYTES:
            return self.r.read_bytes()
        if tid == STRING:
            return self.r.read_string()
        t = self.types.get(tid)
        if t is None:
            raise ValueError(f"gob: value of undefined type {tid}")
        if t["kind"] == "slice":
            n = self.r.read_uint()
            return [self._decode_value(t["elem"]) for _ in range(n)]
        if t["kind"] == "array":
            n = self.r.read_uint()
            if n != t["len"]:
                raise ValueError("gob: array length mismatch")
            return [self._decode_value(t["elem"]) for _ in range(n)]
        if t["kind"] == "map":
            n = self.r.read_uint()
            out = {}
            for _ in range(n):
                k = self._decode_value(t["key"])
                out[k] = self._decode_value(t["elem"])
            return out
        if t["kind"] == "struct":
            out: dict = {}
            field = -1
            while True:
                delta = self.r.read_uint()
                if delta == 0:
                    return out
                field += delta
                if field >= len(t["fields"]):
                    raise ValueError("gob: struct field out of range")
                name, ftid = t["fields"][field]
                out[name] = self._decode_value(ftid)
        raise ValueError(f"gob: cannot decode kind {t['kind']}")

    # -- messages --------------------------------------------------------

    def decode(self) -> Any:
        """Read typedef messages until the first value message; return
        that value (the reference writes exactly one per file)."""
        while not self.r.eof():
            msg_len = self.r.read_uint()
            end = self.r.pos + msg_len
            tid = self.r.read_int()
            if tid < 0:
                self.types[-tid] = self._read_wire_type()
                if self.r.pos != end:
                    raise ValueError("gob: typedef message length mismatch")
                continue
            t = self.types.get(tid)
            if t is None or t["kind"] != "struct":
                # non-struct top level: sent as unnamed 1-field struct
                delta = self.r.read_uint()
                if delta != 1:
                    raise ValueError("gob: bad singleton prefix")
                val = self._decode_value(tid)
            else:
                val = self._decode_value(tid)
            if self.r.pos != end:
                raise ValueError("gob: value message length mismatch")
            return val
        raise ValueError("gob: no value message in stream")


# ---------------------------------------------------------------------------
# encoder (flat-index shape)
# ---------------------------------------------------------------------------


def _enc_struct(fields: list[tuple[int, bytes]]) -> bytes:
    """Encode (field_index, encoded_value) pairs as a struct body.
    Zero-valued fields must already be filtered out by the caller."""
    out, prev = b"", -1
    for idx, payload in fields:
        out += _enc_uint(idx - prev) + payload
        prev = idx
    return out + _enc_uint(0)


def _enc_common(name: str, tid: int) -> bytes:
    fields = []
    if name:
        fields.append((0, _enc_string(name)))
    fields.append((1, _enc_int(tid)))
    return _enc_struct(fields)


def _typedef_msg(tid: int, wire_field: int, body: bytes) -> bytes:
    payload = _enc_int(-tid) + _enc_struct([(wire_field, body)])
    return _enc_uint(len(payload)) + payload


def _enc_field_list(fields: list[tuple[str, int]]) -> bytes:
    out = _enc_uint(len(fields))
    for name, tid in fields:
        out += _enc_struct([(0, _enc_string(name)), (1, _enc_int(tid))])
    return out


def write_gob_flat_index(df: DataFrame, path: str, metric: str = "euclidean",
                         id_col: str = "id", vec_col: str = "embedding",
                         meta_col: str = "metadata") -> int:
    """Export a vectors DataFrame as a reference-loadable flat-index
    gob snapshot (flat.go Load, :207-246). Returns the row count.
    Rows stream through toLocalIterator — the file is inherently a
    single sequential artifact, so no full driver materialization, but
    also no parallel write (documented hand-off path, like .vec)."""
    T_FLOATS, T_META, T_VEC, T_VECMAP, T_IDX = range(_FIRST_USER_ID,
                                                     _FIRST_USER_ID + 5)
    header = b"".join([
        # []float32 (slice of FLOAT)
        _typedef_msg(T_FLOATS, 1,
                     _enc_struct([(0, _enc_common("", T_FLOATS)),
                                  (1, _enc_int(FLOAT))])),
        # map[string]string
        _typedef_msg(T_META, 3,
                     _enc_struct([(0, _enc_common("", T_META)),
                                  (1, _enc_int(STRING)),
                                  (2, _enc_int(STRING))])),
        # Vector struct — field NAMES are the contract gob matches on
        _typedef_msg(T_VEC, 2,
                     _enc_struct([(0, _enc_common("Vector", T_VEC)),
                                  (1, _enc_field_list(
                                      [("ID", STRING),
                                       ("Values", T_FLOATS),
                                       ("Dimension", INT),
                                       ("Metadata", T_META)]))])),
        # map[string]*Vector (pointers flatten on the wire)
        _typedef_msg(T_VECMAP, 3,
                     _enc_struct([(0, _enc_common("", T_VECMAP)),
                                  (1, _enc_int(STRING)),
                                  (2, _enc_int(T_VEC))])),
        # indexData
        _typedef_msg(T_IDX, 2,
                     _enc_struct([(0, _enc_common("indexData", T_IDX)),
                                  (1, _enc_field_list(
                                      [("Vectors", T_VECMAP),
                                       ("Metric", STRING)]))])),
    ])

    def enc_vector(vid: str, values, meta) -> bytes:
        fields = []
        if vid:
            fields.append((0, _enc_string(vid)))
        vals = [float(x) for x in (values or [])]
        if vals:
            fields.append((1, _enc_uint(len(vals))
                           + b"".join(_enc_float(v) for v in vals)))
        if vals:  # Dimension: zero omitted
            fields.append((2, _enc_int(len(vals))))
        if meta:
            body = _enc_uint(len(meta))
            for k in sorted(meta):
                body += _enc_string(k) + _enc_string(str(meta[k]))
            fields.append((3, body))
        return _enc_struct(fields)

    n = 0
    chunks: list[bytes] = []  # join once — += on bytes is O(n^2) copying
    for row in df.select(id_col, vec_col, meta_col).toLocalIterator():
        chunks.append(_enc_string(str(row[0])))
        chunks.append(enc_vector(str(row[0]), row[1], dict(row[2] or {})))
        n += 1
    idx_fields = [(0, _enc_uint(n) + b"".join(chunks))]
    if metric:
        idx_fields.append((1, _enc_string(metric)))
    value = _enc_int(T_IDX) + _enc_struct(idx_fields)
    with open(path, "wb") as f:
        f.write(header + _enc_uint(len(value)) + value)
    return n


def write_gob_hnsw_index(index, path: str,
                         ef_construction: int = 200,
                         ef_search: int = 50) -> int:
    """Export a ``KnnGraphIndex`` as a reference-loadable HNSW gob
    snapshot (hnsw.go Load, :602-652) — closing the graph-interop
    round trip (import has existed since ``read_gob_hnsw_index``).
    Returns the node count.

    Shape mapping: every node lands on level 0 (our graph is the
    flattened analogue; the reference walks whatever levels the
    snapshot carries, and level-0-only is a valid HNSW state), the
    stored edge distances are recomputed from the vectors with the
    index's own metric (the reference keeps them in
    ``Edges[level][neighbor]``), EntryPoint is our first deterministic
    entry id, and Config carries our ``m`` with the reference's
    documented defaults for the rest (LevelMult = 1/ln(M),
    DefaultHNSWConfig hnsw.go:44-53). Zero-valued gob fields (Level=0,
    Deleted=false — tombstones are compacted away first) are omitted
    per the wire spec.

    Same scale contract as the flat exporter: a gob file is a single
    sequential artifact, so rows stream driver-side; use the parquet
    layout for engine-native persistence."""
    import math

    from ..functions.distance import distance

    T_FLOATS, T_META, T_VEC, T_EDGEMAP, T_EDGES, T_CFG, T_NODE, \
        T_NODEMAP, T_IDX = range(_FIRST_USER_ID, _FIRST_USER_ID + 9)
    header = b"".join([
        _typedef_msg(T_FLOATS, 1,
                     _enc_struct([(0, _enc_common("", T_FLOATS)),
                                  (1, _enc_int(FLOAT))])),
        _typedef_msg(T_META, 3,
                     _enc_struct([(0, _enc_common("", T_META)),
                                  (1, _enc_int(STRING)),
                                  (2, _enc_int(STRING))])),
        _typedef_msg(T_VEC, 2,
                     _enc_struct([(0, _enc_common("Vector", T_VEC)),
                                  (1, _enc_field_list(
                                      [("ID", STRING),
                                       ("Values", T_FLOATS),
                                       ("Dimension", INT),
                                       ("Metadata", T_META)]))])),
        # map[string]float32 — one level's neighbor -> distance
        _typedef_msg(T_EDGEMAP, 3,
                     _enc_struct([(0, _enc_common("", T_EDGEMAP)),
                                  (1, _enc_int(STRING)),
                                  (2, _enc_int(FLOAT))])),
        # []map[string]float32 — Edges, indexed by level
        _typedef_msg(T_EDGES, 1,
                     _enc_struct([(0, _enc_common("", T_EDGES)),
                                  (1, _enc_int(T_EDGEMAP))])),
        _typedef_msg(T_CFG, 2,
                     _enc_struct([(0, _enc_common("HNSWConfig", T_CFG)),
                                  (1, _enc_field_list(
                                      [("M", INT),
                                       ("EfConstruction", INT),
                                       ("EfSearch", INT),
                                       ("MaxLevel", INT),
                                       ("LevelMult", FLOAT)]))])),
        _typedef_msg(T_NODE, 2,
                     _enc_struct([(0, _enc_common("Node", T_NODE)),
                                  (1, _enc_field_list(
                                      [("Vector", T_VEC),
                                       ("Edges", T_EDGES),
                                       ("Level", INT),
                                       ("Deleted", BOOL)]))])),
        _typedef_msg(T_NODEMAP, 3,
                     _enc_struct([(0, _enc_common("", T_NODEMAP)),
                                  (1, _enc_int(STRING)),
                                  (2, _enc_int(T_NODE))])),
        _typedef_msg(T_IDX, 2,
                     _enc_struct([(0, _enc_common("indexData", T_IDX)),
                                  (1, _enc_field_list(
                                      [("Nodes", T_NODEMAP),
                                       ("EntryPoint", STRING),
                                       ("CurrentMaxLevel", INT),
                                       ("Config", T_CFG),
                                       ("Metric", STRING)]))])),
    ])

    compacted = index.compact()
    id_col, vec_col = index.id_col, index.vec_col
    from pyspark.sql import functions as F
    src_v = compacted.table.select(F.col(id_col).alias("src"),
                                   F.col(vec_col).alias("__src_vec"))
    scored = (compacted.edges.join(src_v, "src")
              .select("src", "dst",
                      distance(index.metric, F.col("__src_vec"),
                               F.col("dst_vec")).alias("__d")))
    adj: dict = {}
    for r in scored.toLocalIterator():
        adj.setdefault(str(r["src"]), []).append(
            (str(r["dst"]), float(r["__d"])))

    def enc_vector(vid: str, values) -> bytes:
        fields = [(0, _enc_string(vid))] if vid else []
        vals = [float(x) for x in (values or [])]
        if vals:
            fields.append((1, _enc_uint(len(vals))
                           + b"".join(_enc_float(v) for v in vals)))
            fields.append((2, _enc_int(len(vals))))
        return _enc_struct(fields)

    def enc_node(vid: str, values) -> bytes:
        fields = [(0, enc_vector(vid, values))]
        level0 = sorted(adj.get(vid, []))
        if level0:
            emap = _enc_uint(len(level0))
            for dst, d in level0:
                emap += _enc_string(dst) + _enc_float(d)
            fields.append((1, _enc_uint(1) + emap))  # one level
        # Level=0 and Deleted=false are zero values: omitted
        return _enc_struct(fields)

    n = 0
    chunks: list[bytes] = []
    for row in (compacted.table.select(id_col, vec_col)
                .toLocalIterator()):
        vid = str(row[0])
        chunks.append(_enc_string(vid))
        chunks.append(enc_node(vid, row[1]))
        n += 1
    m = int(index.m) or 16
    cfg = _enc_struct([
        (0, _enc_int(m)),
        (1, _enc_int(int(ef_construction))),
        (2, _enc_int(int(ef_search))),
        # MaxLevel=0 omitted (zero value)
        (4, _enc_float(1.0 / math.log(m) if m > 1 else 1.0)),
    ])
    idx_fields = []
    if n:
        idx_fields.append((0, _enc_uint(n) + b"".join(chunks)))
        entry = index._entry_points()
        if entry:
            idx_fields.append((1, _enc_string(str(entry[0][0]))))
    # CurrentMaxLevel=0 omitted (zero value)
    idx_fields.append((3, cfg))
    if index.metric:
        idx_fields.append((4, _enc_string(index.metric)))
    value = _enc_int(T_IDX) + _enc_struct(idx_fields)
    with open(path, "wb") as f:
        f.write(header + _enc_uint(len(value)) + value)
    return n


# ---------------------------------------------------------------------------
# DataFrame importers
# ---------------------------------------------------------------------------

_VEC_SCHEMA = "id string, embedding array<float>, metadata map<string,string>"


def _vec_rows(vectors: dict) -> list:
    rows = []
    for vid, v in sorted(vectors.items()):
        rows.append((v.get("ID", vid),
                     [float(x) for x in v.get("Values", [])],
                     {k: str(val) for k, val in
                      v.get("Metadata", {}).items()}))
    return rows


def read_gob_flat_index(spark: SparkSession, path: str):
    """Import a reference flat-index snapshot. Returns ``(df, metric)``
    with the engine's vectors schema."""
    with open(path, "rb") as f:
        data = GobDecoder(f.read()).decode()
    df = spark.createDataFrame(_vec_rows(data.get("Vectors", {})),
                               _VEC_SCHEMA)
    return df, data.get("Metric", "")


def read_gob_index_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Import the VECTORS of either snapshot shape (flat or HNSW) —
    the CLI import path: sniffs the decoded top-level keys instead of
    trusting the filename."""
    with open(path, "rb") as f:
        data = GobDecoder(f.read()).decode()
    if "Vectors" in data:
        return spark.createDataFrame(_vec_rows(data["Vectors"]), _VEC_SCHEMA)
    if "Nodes" in data:
        live = {vid: n.get("Vector", {})
                for vid, n in data["Nodes"].items()
                if not n.get("Deleted", False)}
        return spark.createDataFrame(_vec_rows(live), _VEC_SCHEMA)
    raise ValueError("gob: not a reference index snapshot "
                     "(no Vectors/Nodes field)")


def read_gob_hnsw_index(spark: SparkSession, path: str):
    """Import a reference HNSW snapshot (hnsw.go:556-652) directly into
    the graph tier: node vectors become the table, level-0 links become
    the (src, dst, dst_vec) edge frame — the reference's own graph,
    searchable by KnnGraphIndex's beam walk. Deleted nodes are dropped
    (their tombstone already says skip). Returns ``(KnnGraphIndex,
    metric)``."""
    from ..operators.graph import KnnGraphIndex

    with open(path, "rb") as f:
        data = GobDecoder(f.read()).decode()
    nodes = {vid: node for vid, node in data.get("Nodes", {}).items()
             if not node.get("Deleted", False)}
    table = spark.createDataFrame(
        _vec_rows({vid: n.get("Vector", {}) for vid, n in nodes.items()}),
        _VEC_SCHEMA)
    edge_rows = []
    for vid, node in sorted(nodes.items()):
        levels = node.get("Edges", [])
        level0 = levels[0] if levels else {}
        for dst, _dist in sorted(level0.items()):
            dst_node = nodes.get(dst)
            if dst_node is None:
                continue  # link to a deleted node: skip like the ref
            edge_rows.append(
                (vid, dst,
                 [float(x) for x in dst_node.get("Vector", {})
                  .get("Values", [])]))
    edges = spark.createDataFrame(
        edge_rows, "src string, dst string, dst_vec array<float>")
    cfg = data.get("Config", {})
    m = int(cfg.get("M", 16)) or 16
    idx = KnnGraphIndex(table, edges, id_col="id", vec_col="embedding",
                        m=m, metric=data.get("Metric", "") or "euclidean")
    return idx, data.get("Metric", "")
