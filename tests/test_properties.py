"""Property-based tests (hypothesis) for the pure-expression
operators: the SQL expression must agree with an independent Python
reference on arbitrary inputs, not just fixture values.

Each example runs as ONE Spark job over a generated batch (not a job
per value), so the suite stays fast; ``max_examples`` is kept small
because every example already covers dozens of generated rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import zorder_key_sql

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=64,
    )
)
def test_zorder_key_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a BIGINT, b BIGINT")
    got = df.select("a", "b", F.expr(zorder_key_sql("a", "b")).alias("z")).collect()
    for r in got:
        assert r.z == _morton_ref(r.a, r.b), (r.a, r.b)


@_slow
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=200),
        min_size=1,
        max_size=16,
    )
)
def test_chunking_reconstructs_documents(spark, texts):
    """Chunking is lossless: re-joining a doc's chunks in chunk_idx
    order yields the original token sequence, and every chunk except
    the last is exactly max_tokens long."""
    from sfs3_kinesis_spark.operators import sampling

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    chunks = sampling.chunk_text(df, "doc_id", "text", 8).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, text in rows:
        cs = sorted(by_doc[doc_id], key=lambda c: c.chunk_idx)
        toks = text.split(" ")
        rebuilt = [tok for c in cs for tok in (c.chunk_text.split(" ") if c.chunk_text else [""])]
        # a doc with no tokens still yields one (empty) chunk row
        assert rebuilt == toks or (toks == [""] and rebuilt == [""])
        for c in cs[:-1]:
            assert c.n_chunk_tokens == 8
        assert cs[-1].n_chunk_tokens <= 8
