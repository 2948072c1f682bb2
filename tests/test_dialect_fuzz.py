"""Hostile-input pressure tests for the dialect front-end
(plans/dialect.py) — the discipline of the reference's table-driven
invalid-statement tests (/root/reference/pkg/sql/sql_test.go): every
malformed statement must raise a CLEAN error (ValueError / KeyError /
Spark analysis or parse error), never a silently-wrong rewrite handed
to spark.sql; every valid statement must be case-insensitive and
quote-escape-safe (no injection through metadata values or ids)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401  (parity helpers)
from toy_vector_db_spark.plans.catalog import CollectionCatalog
from toy_vector_db_spark.plans.dialect import SqlEngine
from toy_vector_db_spark.schema import five_vectors, vectors_meta


@pytest.fixture()
def engine(spark, tmp_path):
    eng = SqlEngine(spark, CollectionCatalog(spark, str(tmp_path / "coll")))
    five_vectors(spark).createOrReplaceTempView("vectors")
    vectors_meta(spark).createOrReplaceTempView("vmeta")
    return eng


# -- invalid statements: table-driven, every row must raise ----------------

INVALID = [
    # malformed NEAREST TO operands
    "SELECT id FROM vectors NEAREST TO",                 # no operand
    "SELECT id FROM vectors NEAREST TO [1.0, 2.0",       # unclosed bracket
    "SELECT id FROM vectors NEAREST TO [1.0, oops]",     # non-numeric element
    "SELECT id FROM vectors NEAREST TO []",              # empty vector
    "SELECT id FROM vectors NEAREST TO [1.0] USING bogus",   # unknown metric
    "SELECT id FROM vectors NEAREST TO [1.0,0.0,0.0] LIMIT abc",  # bad LIMIT
    "SELECT id FROM vectors NEAREST TO [1.0,0.0,0.0] LIMIT -3",   # bad LIMIT
    "SELECT id FROM vectors NEAREST TO [1.0,0.0,0.0] ORDER BY id",  # trailing
    "SELECT id FROM vectors NEAREST TO [1.0, 2.0]",      # dimension mismatch
    "SELECT id FROM vectors NEAREST TO 'no-such-id'",    # unknown id ref
    "SELECT id FROM vectors NEAREST TO (SELECT embedding FROM vectors "
    "WHERE id = 'nope')",                                # empty subquery
    # projection errors
    "SELECT bogus_col FROM vectors",                     # unknown column
    "SELECT distance FROM vectors",                      # distance w/o knn
    # DML errors
    "INSERT INTO vectors VALUES",                        # unparsable
    "INSERT INTO vectors (id, vector, bogus) VALUES "
    "('a', [1.0], 'x')",                                 # unknown column
    "INSERT INTO vectors (id, vector) VALUES ('a')",     # count mismatch
    "INSERT INTO vectors (vector) VALUES ([1.0])",       # id missing
    "DELETE FROM vectors",                               # WHERE required
    "UPDATE vectors SET id = 'v9' WHERE id = 'v1'",      # id immutable
    # DDL / maintenance that misses the grammar falls through to
    # spark.sql and must come back as a Spark parse error, not succeed
    "CREATE COLLECTION",                                 # missing name
    "OPTIMIZE vectors FILES many",                       # bad FILES arg
    "SELECT FROM vectors",                               # no projection
    "",                                                  # empty statement
    ";;;",                                               # separators only
]


@pytest.mark.parametrize("stmt", INVALID)
def test_invalid_statement_raises_clean_error(engine, stmt):
    with pytest.raises(Exception) as exc:
        res = engine.execute(stmt)
        if res.df is not None:          # lazily-built frames: force them
            res.df.collect()
    # "clean" = a typed error, never a crash of the py4j bridge or a
    # silent empty result; the common types below cover parser errors
    # (ValueError), missing refs (KeyError), and Catalyst rejections
    assert exc.type.__name__ in (
        "ValueError", "KeyError", "AnalysisException", "ParseException",
        "IndexError", "IllegalArgumentException", "Py4JJavaError",
        "SparkRuntimeException", "NumberFormatException",
    ), (stmt, exc.type, str(exc.value)[:200])


def test_dimension_mismatch_is_an_error_not_null_rows(engine):
    """zip_with null-pads a length mismatch — without the in-plan
    guard the query would RETURN k rows with NULL distances (a wrong
    answer). It must raise with the dimension message instead."""
    with pytest.raises(Exception, match="dimension"):
        engine.sql("SELECT id, distance FROM vectors "
                   "NEAREST TO [1.0, 0.0]").collect()


def test_null_embedding_row_does_not_kill_query(engine, spark):
    """ADVICE r7: size(NULL) is NULL, so a null-embedding row fell
    through the dimension guard's CASE WHEN to the raise branch and
    one bad row killed the whole NEAREST TO query. It must instead
    keep a NULL distance and sort NULLS LAST (i.e. be skipped)."""
    spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("hole", None)],
        "id string, embedding array<double>",
    ).createOrReplaceTempView("nullvecs")
    rows = engine.sql("SELECT id, distance FROM nullvecs "
                      "NEAREST TO [1.0, 0.0] LIMIT 2").collect()
    assert [r["id"] for r in rows] == ["a", "b"]
    # and a LIMIT big enough to reach the null row returns it last,
    # with a NULL distance — never an error
    rows = engine.sql("SELECT id, distance FROM nullvecs "
                      "NEAREST TO [1.0, 0.0] LIMIT 3").collect()
    assert rows[-1]["id"] == "hole" and rows[-1]["distance"] is None


def test_null_embedding_does_not_mask_real_mismatch(engine, spark):
    """The NULL branch must not swallow the guard: a genuine
    dimension mismatch alongside null rows still raises."""
    spark.createDataFrame(
        [("a", [1.0, 0.0]), ("hole", None)],
        "id string, embedding array<double>",
    ).createOrReplaceTempView("nullvecs2")
    with pytest.raises(Exception, match="dimension"):
        engine.sql("SELECT id FROM nullvecs2 "
                   "NEAREST TO [1.0, 0.0, 0.0] LIMIT 2").collect()


def test_limit_keyword_inside_string_literal_is_not_a_clause(engine):
    """ADVICE r7: _WHERE_RE used to terminate the condition at any
    \\bLIMIT\\b token — including inside a string literal — so
    ``WHERE metadata.note = 'limit reached' LIMIT 5`` raised
    'unparsed clause'. The clause split is now quote-masked."""
    rows = engine.sql(
        "SELECT id, distance FROM vmeta NEAREST TO [1.0, 0.0, 0.0, 0.0] "
        "WHERE metadata.category != 'limit reached' LIMIT 2").collect()
    assert len(rows) == 2        # missing-key != is TRUE, so all match
    # same with a quoted WHERE keyword, and with the '' escape
    rows = engine.sql(
        "SELECT id FROM vmeta NEAREST TO [1.0, 0.0, 0.0, 0.0] "
        "WHERE metadata.category != 'where it''s limit 9' LIMIT 3").collect()
    assert len(rows) == 3


def test_quoted_limit_without_real_limit_uses_default(engine):
    """A LIMIT-shaped tail INSIDE a literal must not be consumed as
    the real LIMIT clause; the knn default (10) applies."""
    rows = engine.sql(
        "SELECT id FROM vmeta NEAREST TO [1.0, 0.0, 0.0, 0.0] "
        "WHERE metadata.category != 'LIMIT 1'").collect()
    assert len(rows) == 5        # all rows, not 1


def test_trailing_clause_never_silently_dropped(engine):
    """Pre-r7 the tail of the statement after WHERE/LIMIT extraction
    was discarded — 'ORDER BY id' after a knn clause parsed fine and
    silently did nothing. Now: explicit unparsed-clause error."""
    with pytest.raises(ValueError, match="unparsed clause"):
        engine.execute("SELECT id FROM vectors NEAREST TO [1.0,0.0,0.0] "
                       "ORDER BY id LIMIT 2")


# -- case-insensitivity: same rows whatever the keyword casing -------------

def test_mixed_case_keywords_equal_uppercase(engine):
    up = engine.sql("SELECT id, distance FROM vectors NEAREST TO "
                    "[1.0, 0.0, 0.0] USING COSINE WHERE id != 'vec3' "
                    "LIMIT 3").collect()
    lo = engine.sql("select id, distance from vectors nearest to "
                    "[1.0, 0.0, 0.0] using cosine where id != 'vec3' "
                    "limit 3").collect()
    mixed = engine.sql("SeLeCt id, distance FrOm vectors NeArEsT tO "
                       "[1.0, 0.0, 0.0] UsInG CoSiNe WhErE id != 'vec3' "
                       "LiMiT 3").collect()
    assert [tuple(r) for r in up] == [tuple(r) for r in lo] \
        == [tuple(r) for r in mixed]


# -- quote escaping / injection shapes --------------------------------------

def test_meta_rewrite_keeps_injection_shaped_literal_intact():
    """A metadata value full of quote escapes and boolean fragments
    must stay ONE string literal through the rewrite — the classic
    injection shape ('x'' OR ''1''=''1') cannot break out."""
    rewritten = SqlEngine._rewrite_meta(
        "metadata.key != 'x'' OR ''1''=''1'")
    assert rewritten == \
        "coalesce(metadata['key'] <> 'x'' OR ''1''=''1', true)"


def test_meta_shaped_text_inside_literal_is_not_rewritten():
    """r8: the metadata.K sugar must not fire INSIDE a string literal —
    pre-r8 ``'see metadata.category'`` became ``'see metadata['...']'``
    (a corrupted literal). The rewrite now locates matches on the
    quote-masked shadow."""
    got = SqlEngine._rewrite_meta(
        "metadata.a = 'metadata.b' AND note = 'x != metadata.c'")
    assert got == "metadata['a'] = 'metadata.b' AND note = 'x != metadata.c'"
    # and the != wrapper still composes with escaped quotes around it
    got = SqlEngine._rewrite_meta(
        "tag = 'metadata.k != ''v''' OR metadata.k != 'v'")
    assert got == ("tag = 'metadata.k != ''v''' OR "
                   "coalesce(metadata['k'] <> 'v', true)")


def test_injection_shaped_metadata_value_finds_nothing_extra(engine):
    # vmeta has no row whose 'category' equals the hostile literal, so
    # != must keep ALL rows (missing-key => TRUE quirk included) —
    # if the literal broke out of its quotes this would throw or
    # return a filtered set
    n_all = engine.sql("SELECT id FROM vmeta").count()
    got = engine.sql("SELECT id FROM vmeta WHERE "
                     "metadata.category != 'x'' OR ''1''=''1'").count()
    assert got == n_all


def test_id_reference_with_embedded_quote_is_escaped(engine, spark):
    spark.createDataFrame(
        [("it's", [9.0, 9.0, 9.0]), ("other", [9.0, 9.0, 8.0])],
        "id string, embedding array<double>",
    ).createOrReplaceTempView("qids")
    rows = engine.sql(
        "SELECT id, distance FROM qids NEAREST TO 'it''s' LIMIT 5").collect()
    # self-exclusion applied through a correctly re-escaped literal
    assert [r["id"] for r in rows] == ["other"]


def test_string_literal_commas_do_not_split_projection(engine):
    rows = engine.sql("SELECT id, metadata.category FROM vmeta "
                      "WHERE metadata.category = 'a,b' LIMIT 5").collect()
    assert rows == [] or all("," in (r[1] or "") for r in rows)


# -- light fuzz: random garbage must raise, never hang or half-parse -------

def test_random_garbage_statements_raise(engine):
    import random
    rng = random.Random(7)
    tokens = ["SELECT", "NEAREST", "TO", "[", "]", "'", "FROM", "vectors",
              "USING", "WHERE", "LIMIT", ",", "1.0", "metadata.", "id",
              "(", ")", ";", "''", "cosine", "*"]
    for _ in range(60):
        stmt = " ".join(rng.choice(tokens)
                        for _ in range(rng.randint(1, 12)))
        try:
            res = engine.execute(stmt)
            if res.df is not None:
                res.df.limit(1).collect()   # force analysis/execution
        except Exception:
            continue          # any typed error is a pass
        # statements that genuinely parse (e.g. "SELECT 1.0") may
        # succeed — but they must be real SQL, which means Catalyst
        # accepted them; nothing to assert beyond no-hang/no-crash
