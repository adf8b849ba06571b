"""NULL-sensitivity parity sweep (VERDICT r13 #3).

The driver-generated testdata has ZERO NULLs in ``events.value``, so a
whole divergence class — ``COUNT(*)`` vs ``COUNT(value)`` denominators,
``AVG`` over all-NULL groups, NULL ordering in argmax — was invisible
to every parity sweep (the kpis twin shipped exactly such a latent
divergence, caught only by ADVICE r12/r13 review, never by a test).
The reference's generator plants ~2 % missing values
(dags/airflow_dag_calidad_aire.py:40-132), so NULL handling is core
spec, not an edge case.

This module derives a NULL-bearing scale factor from sf0.001: same
tables, but ``events.value`` is NULLed for (a) a scattered ~6 % of
rows, (b) every row of the earliest calendar day (an all-NULL day for
daily denominators), and (c) every row of one user (an all-NULL group
for per-group argmax / aggregates). Every registered oracle query that
reads ``events`` and touches ``value`` is then hash-compared across
engines on the planted dir — any engine pair that disagrees on NULL
semantics fails here even while the pristine-data sweep stays green.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

from calidad_del_aire_etl_spark import oracle  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# Every oracle-backed query that reads the events table AND references
# its value column — computed, not hand-listed, so a new value-consuming
# query is swept automatically.
NULL_SENSITIVE = sorted(
    name
    for name, sql in _ORACLES.items()
    if re.search(r"\bevents\b", sql) and re.search(r"\bvalue\b", sql)
)


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_nulls")
    for t in oracle.TABLES:
        src = f"{SRC_SF}/{t}.parquet"
        if t != "events" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC_SF}/events.parquet")
    ev_id = tbl.column("event_id")
    user = tbl.column("user_id")
    day = pc.floor_temporal(tbl.column("ts"), unit="day")
    mask = pc.or_(
        pc.or_(
            pc.equal(pc.bit_wise_and(ev_id, 15), 0),  # scattered ~6 %
            pc.equal(day, pc.min(day)),  # one all-NULL day
        ),
        pc.equal(user, pc.min(user)),  # one all-NULL group
    )
    value = pc.if_else(mask, None, tbl.column("value"))
    assert value.null_count > 0
    tbl = tbl.set_column(
        tbl.schema.get_field_index("value"), tbl.schema.field("value"), value
    )
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_nulls(null_sf_dir):
    con = oracle.duck_connection(null_sf_dir)
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_hash_parity_with_null_values(spark, duck_nulls, null_sf_dir, name):
    n, problems = oracle.compare_query(
        spark, duck_nulls, _QUERIES[name], _ORACLES[name], null_sf_dir
    )
    assert not problems, f"{name} (NULL-planted events): {'; '.join(problems)}"


# ---------------------------------------------------------------------------
# Documents variant: NULL / empty / whitespace-only text (the text and
# dedup families' blind spot — the driver corpus has none of the three)
# ---------------------------------------------------------------------------

DOC_NULL_SENSITIVE = sorted(
    name
    for name, sql in _ORACLES.items()
    if re.search(r"\bdocuments\b", sql) and re.search(r"\btext\b", sql)
)


@pytest.fixture(scope="module")
def null_docs_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_doc_nulls")
    for t in oracle.TABLES:
        src = f"{SRC_SF}/{t}.parquet"
        if t != "documents" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC_SF}/documents.parquet")
    doc_id = tbl.column("doc_id")
    mod = pc.bit_wise_and(doc_id, 63)
    text = tbl.column("text")
    # three degenerate classes, each planted on a distinct id residue
    text = pc.if_else(pc.equal(mod, 0), None, text)  # NULL text
    text = pc.if_else(pc.equal(mod, 1), "", text)  # empty text
    text = pc.if_else(pc.equal(mod, 2), " \t  ", text)  # whitespace-only
    n_chars = pc.utf8_length(text)  # keep the length column truthful
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), tbl.schema.field("text"), text
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        tbl.schema.field("n_chars"),
        pc.cast(n_chars, pa.int64()),
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_doc_nulls(null_docs_sf_dir):
    con = oracle.duck_connection(null_docs_sf_dir)
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("name", DOC_NULL_SENSITIVE)
def test_hash_parity_with_degenerate_docs(
    spark, duck_doc_nulls, null_docs_sf_dir, name
):
    n, problems = oracle.compare_query(
        spark, duck_doc_nulls, _QUERIES[name], _ORACLES[name], null_docs_sf_dir
    )
    assert not problems, f"{name} (degenerate docs): {'; '.join(problems)}"


# ---------------------------------------------------------------------------
# Embeddings variant: NULL vectors and all-zero vectors (failed or
# padded embeds — the zero norm hits every cosine denominator). Ragged
# dims are NOT planted: fixed dimension is a documented precondition
# of the vector family (see dedup.COSINE_DUCK).
# ---------------------------------------------------------------------------

VEC_NULL_SENSITIVE = sorted(
    name
    for name, sql in _ORACLES.items()
    if re.search(r"\bembeddings\b", sql)
)


@pytest.fixture(scope="module")
def null_vecs_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_vec_nulls")
    for t in oracle.TABLES:
        src = f"{SRC_SF}/{t}.parquet"
        if t != "embeddings" and os.path.exists(src):
            os.symlink(src, d / f"{t}.parquet")
    tbl = pq.read_table(f"{SRC_SF}/embeddings.parquet")
    ids = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("embedding").to_pylist()
    dim = len(vecs[0])
    planted = []
    for i, v in zip(ids, vecs):
        if i % 97 == 0:
            planted.append(None)  # failed embed
        elif i % 97 == 1:
            planted.append([0.0] * dim)  # zero vector (padding)
        else:
            planted.append(v)
    col = pa.array(planted, type=tbl.schema.field("embedding").type)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        col,
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck_vec_nulls(null_vecs_sf_dir):
    con = oracle.duck_connection(null_vecs_sf_dir)
    yield con
    con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("name", VEC_NULL_SENSITIVE)
def test_hash_parity_with_degenerate_vectors(
    spark, duck_vec_nulls, null_vecs_sf_dir, name
):
    n, problems = oracle.compare_query(
        spark, duck_vec_nulls, _QUERIES[name], _ORACLES[name], null_vecs_sf_dir
    )
    assert not problems, f"{name} (degenerate vectors): {'; '.join(problems)}"


def test_null_fixture_actually_plants_nulls(null_sf_dir):
    """Self-check: the derived dir must carry NULLs, an all-NULL day,
    and an all-NULL user — otherwise the sweep above proves nothing."""
    import duckdb

    con = duckdb.connect()
    n, nn = con.execute(
        f"SELECT count(*), count(value) FROM '{null_sf_dir}/events.parquet'"
    ).fetchone()
    assert n > 0 and nn < n
    all_null_days = con.execute(
        f"SELECT count(*) FROM (SELECT CAST(ts AS DATE) d, count(value) c "
        f"FROM '{null_sf_dir}/events.parquet' GROUP BY 1) WHERE c = 0"
    ).fetchone()[0]
    assert all_null_days >= 1
    all_null_users = con.execute(
        f"SELECT count(*) FROM (SELECT user_id, count(value) c "
        f"FROM '{null_sf_dir}/events.parquet' GROUP BY 1) WHERE c = 0"
    ).fetchone()[0]
    assert all_null_users >= 1
    con.close()
