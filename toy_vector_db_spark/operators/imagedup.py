"""Perceptual image dedup: difference hash (dHash) over REAL decoded
pixels, banded like the text SimHash path — never all-pairs.

Beyond-parity tier (the reference has no image operators); the
algorithm is the public dHash described by Krawetz ("Kind of Like
That", hackerfactor.com, 2013) and used by the pHash family: sample
the image on a (grid+1) x grid luminance grid, emit one bit per
horizontally-adjacent comparison, and near-identical images land
within a few Hamming bits of each other — robust to re-encoding,
resizing, and small retouches, unlike byte-level hashing.

Pipeline shape (mirrors ``dedup.simhash_hamming_pairs``):

  payload --decode+grid-sample--> 64-bit dhash      (map-only Arrow UDF)
       --pigeonhole banding--> (band, value) buckets (1 shuffle of
                                                      (id, small int))
       --bucket pairs + xor/popcount verify--> (id_a, id_b, hamming)

Pigeonhole: two hashes within ``max_hamming < bands`` bits agree on
at least one whole band, so the banded candidate set is COMPLETE for
the emitted pair predicate. ``max_bucket`` is the same degenerate-
bucket guard as MinHash-LSH (a corpus-sized family of identical
images would otherwise make one bucket quadratic; over-cap buckets
fall back to star candidates).

Determinism contract: the grid sample uses pure integer floor maps
(``r*h // grid``), and the luminance is the exact integer channel sum
(0..765) — no float anywhere — so the DuckDB oracle replays every bit
from the synthetic corpus' closed-form pixel formula
(workload.media_dhash / dedup_image_dhash).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .media import _try_decode_pixels

#: dHash geometry: GRID x GRID bits from a (GRID+1) x GRID sample.
GRID = 8
BITS = GRID * GRID

DHASH_DDL = "media_id STRING, dhash LONG"


def dhash_bits(px: np.ndarray, grid: int = GRID) -> int:
    """uint8 (H, W, 3) pixels -> dHash as a Python int in int64 range
    (two's-complement wrap when bit 63 is set). Bit ``r*grid + c`` is
    1 iff the sampled luminance at (r, c) exceeds (r, c+1).

    Exact-integer math throughout: nearest-neighbor sample indices are
    ``(i * dim) // n`` and luminance is the channel SUM (not mean — no
    division, same ordering), so every bit is reproducible by integer
    arithmetic on the source pixels."""
    h, w = px.shape[:2]
    yi = (np.arange(grid) * h) // grid
    xi = (np.arange(grid + 1) * w) // (grid + 1)
    g = px[yi][:, xi].sum(axis=2, dtype=np.int64)      # (grid, grid+1)
    bits = (g[:, :-1] > g[:, 1:]).flatten()            # row-major r*grid+c
    val = int(bits @ (1 << np.arange(bits.size, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val


def ahash_bits(px: np.ndarray, grid: int = GRID) -> int:
    """Average hash (the dHash's mean-threshold sibling): sample a
    grid x grid luminance grid, set bit ``r*grid + c`` iff the cell
    exceeds the grid MEAN. The compare is ``n*s > total`` — integer
    multiply instead of a float mean, so ties break deterministically
    to 0 and the oracle replays it exactly."""
    h, w = px.shape[:2]
    yi = (np.arange(grid) * h) // grid
    xi = (np.arange(grid) * w) // grid
    g = px[yi][:, xi].sum(axis=2, dtype=np.int64).flatten()
    bits = g * g.size > g.sum()
    val = int(bits @ (1 << np.arange(bits.size, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val


def ahash_media(df: DataFrame, grid: int = GRID,
                jpeg_backend: str | None = None) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, ahash BIGINT); same
    map-only / NULL-quarantine contract as ``dhash_media``. The
    banding verifier (``dhash_hamming_pairs``) is hash-agnostic, so
    aHash near-dup pairs reuse it unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _try_decode_pixels(bytes(payload or b""), jpeg_backend)
                out.append((mid, ahash_bits(px, grid)
                            if px is not None else None))
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return df.select("media_id", "payload").mapInPandas(
        batches, "media_id STRING, ahash LONG")


def dhash_media(df: DataFrame, grid: int = GRID,
                jpeg_backend: str | None = None) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, dhash BIGINT). Map-only
    mapInPandas (same no-shuffle contract as ``media.decode_media``);
    payloads the real codecs cannot decode get a NULL dhash — the
    quarantine path, never a fabricated hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _try_decode_pixels(bytes(payload or b""), jpeg_backend)
                out.append((mid, dhash_bits(px, grid)
                            if px is not None else None))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return df.select("media_id", "payload").mapInPandas(batches, DHASH_DDL)


def dhash_hamming_pairs(hashed: DataFrame, id_col: str = "media_id",
                        hash_col: str = "dhash", bits: int = BITS,
                        bands: int = 4, max_hamming: int = 3,
                        max_bucket: int | None = 64) -> DataFrame:
    """Near-dup image pairs within ``max_hamming`` dHash bits from a
    (id, hash) frame — banding + verification only, so callers can
    hash once and reuse. Output: (id_a, id_b, hamming), id_a < id_b.

    Same pigeonhole contract as ``dedup.simhash_hamming_pairs`` (at
    least one of ``bands`` contiguous bands agrees when fewer than
    ``bands`` bits differ); band extraction masks after the shift, so
    a negative packed hash (bit 63 set) bands correctly. NULL hashes
    (undecodable payloads) are excluded up front.

    cap: max_bucket=64 is the same star-cap default as the text
    MinHash/SimHash banding (dedup._bucket_pairs): a corpus-sized
    family of identical images degrades to linear star candidates
    instead of one quadratic bucket; the trade is pair recall inside
    oversized families, never correctness of emitted pairs."""
    if not 0 < bands <= bits:
        raise ValueError(f"bands must be in 1..{bits}, got {bands}")
    if max_hamming >= bands:
        raise ValueError(f"pigeonhole needs max_hamming < bands, got "
                         f"{max_hamming} >= {bands}")
    if bits % bands:
        raise ValueError(f"bands must divide bits, got {bits}/{bands}")
    width = bits // bands
    mask = (1 << width) - 1
    base = hashed.filter(F.col(hash_col).isNotNull()) \
        .select(F.col(id_col).alias("__id"), F.col(hash_col).alias("__h"))

    def band_key(h, b: int):
        # arithmetic shiftright sign-extends for b*width >= 48 on a
        # negative hash; the mask keeps only the band's low bits
        return F.concat(F.lit(f"{b}|"),
                        (F.shiftright(h, b * width)
                         .bitwiseAND(F.lit(mask))).cast("string"))

    banded = base.select(
        "__id", "__h",
        F.explode(F.array(*[band_key(F.col("__h"), b)
                            for b in range(bands)])).alias("__band"))
    from .dedup import _bucket_pairs
    elems = banded.select("__band", F.struct("__id", "__h").alias("__e"))
    pairs = (_bucket_pairs(elems, "__band", "__e", max_bucket)
             .select(F.col("a.__id").alias("id_a"),
                     F.col("b.__id").alias("id_b"),
                     F.col("a.__h").alias("h_a"),
                     F.col("b.__h").alias("h_b"))
             .distinct())
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("bigint")
    return (pairs.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def image_dup_pairs(df: DataFrame, grid: int = GRID, bands: int = 4,
                    max_hamming: int = 3,
                    max_bucket: int | None = 64,
                    jpeg_backend: str | None = None) -> DataFrame:
    """End-to-end perceptual near-dup pairs over a media table:
    decode -> dHash -> banded buckets -> verified (id_a, id_b,
    hamming). One shuffle total (the band groupBy; hashing is
    map-only), so the shape survives a 100 TB image corpus — the
    shuffle carries (id, 64-bit hash) rows, never pixels.
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return dhash_hamming_pairs(dhash_media(df, grid, jpeg_backend),
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


def hamming_ball_groups(hashed: DataFrame, id_col: str = "media_id",
                        hash_col: str = "dhash", bits: int = BITS,
                        bands: int = 4, max_hamming: int = 3,
                        max_bucket: int | None = 64) -> DataFrame:
    """Hamming-ball grouping over ANY (id, 64-bit hash) frame ->
    (id, group_id, n_members, keep) with ``keep`` = the group's
    minimum id (the deterministic survivor a dedup pass retains).
    EVERY non-null-hash row is covered. Hash-agnostic like
    ``dhash_hamming_pairs`` — image dHash and the audio fingerprint
    ride the same grouping (r10).

    Two-level structure (the production shape): rows collapse into
    EXACT-HASH classes first (one shuffle on the 64-bit hash — a
    hash-identical family of any size costs one aggregate row), then
    only the class REPRESENTATIVES (min id per hash) go through the
    banded Hamming pairing, and the transitive closure runs over the
    representative graph. Banding raw rows instead would both do
    redundant work (every member of a family lands in the same
    buckets) and, worse, lose whole families to the star cap: an
    over-cap bucket holding TWO hash-identical families emits star
    pairs from the single bucket-min center, and the far family's
    pairs all fail the Hamming verify — on the r9 200k/48-family
    image pathology corpus that left ~4% of rows unpaired.
    Class-level banding makes bucket size = DISTINCT hashes per band
    value, so the cap only engages on genuine near-dup diversity.
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default,
    applied to hash-class representatives."""
    hashed = hashed.filter(F.col(hash_col).isNotNull()) \
        .select(F.col(id_col).alias("media_id"),
                F.col(hash_col).alias("__h"))
    classes = hashed.groupBy("__h").agg(
        F.min("media_id").alias("__rep"),
        F.count(F.lit(1)).alias("__class_n")).localCheckpoint(eager=False)
    reps = classes.select(F.col("__rep").alias("media_id"), "__h")
    rep_pairs = dhash_hamming_pairs(reps, hash_col="__h", bits=bits,
                                    bands=bands,
                                    max_hamming=max_hamming,
                                    max_bucket=max_bucket)
    from .components import connected_components
    cc = connected_components(rep_pairs, a_col="id_a", b_col="id_b")
    labeled = (classes.join(cc, classes["__rep"] == cc["node"], "left")
               .select("__h", "__rep", "__class_n",
                       F.coalesce("component", "__rep").alias("group_id")))
    sizes = labeled.groupBy("group_id").agg(
        F.sum("__class_n").alias("n_members"),
        F.min("__rep").alias("keep"))
    return (hashed.join(labeled.select("__h", "group_id"), "__h")
            .join(sizes, "group_id")
            .select(F.col("media_id").alias(id_col), "group_id",
                    "n_members", "keep"))


def image_dup_groups(df: DataFrame, grid: int = GRID, bands: int = 4,
                     max_hamming: int = 3,
                     max_bucket: int | None = 64,
                     jpeg_backend: str | None = None) -> DataFrame:
    """decode -> dHash -> ``hamming_ball_groups`` (see there for the
    class-level structure and the star-cap rationale).
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return hamming_ball_groups(dhash_media(df, grid, jpeg_backend),
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


GRID_FEATURES_DDL = "media_id STRING, features ARRAY<DOUBLE>"


def grid_luminance_features(df: DataFrame, grid: int = GRID,
                            jpeg_backend: str | None = None) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, features): the grid x
    grid integer luminance cells (channel sums, 0..765) as a
    deterministic image EMBEDDING — the aHash sample grid WITHOUT
    thresholding, so near-identical images are near in L2 and the
    vector feeds the existing knn/ANN tiers (r10, VERDICT r9 Next #4).
    Exact integers emitted as DOUBLE: distance sums stay under 2^53,
    so a closed-form oracle value-hashes the full decode -> embed ->
    knn pipeline (workload.knn_image_topk). Map-only mapInPandas,
    NULL-quarantine for undecodable payloads like dhash_media."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _try_decode_pixels(bytes(payload or b""), jpeg_backend)
                if px is None:
                    out.append((mid, None))
                    continue
                h, w = px.shape[:2]
                yi = (np.arange(grid) * h) // grid
                xi = (np.arange(grid) * w) // grid
                cells = px[yi][:, xi].sum(axis=2, dtype=np.int64)
                out.append((mid, cells.flatten().astype(np.float64)))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.select("media_id", "payload").mapInPandas(
        batches, GRID_FEATURES_DDL)
