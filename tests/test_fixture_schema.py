"""Fixture schema drift guard.

The driver regenerates /root/testdata per round and has already changed
column physical types between rounds (events.ts shipped as parquet
TIMESTAMP(NANOS) in rounds 1-3, TIMESTAMP(MICROS) from round 4). When
that happens we want ONE clear assertion failure naming the drifted
column, not N opaque AnalysisExceptions scattered across parity tests.

These checks assert the schema AS LOADED through tables.load (i.e. after
any normalization the loader applies), which is the contract every query
in the registry builds on.
"""

from __future__ import annotations

import pytest

from oraaud_kafka_spark import tables

# Logical schema every downstream query assumes, per table: column -> Spark
# dtype. events.ts may physically be nanos or micros in parquet; the loader
# must normalize either to a timestamp type.
_TS = ("timestamp", "timestamp_ntz")

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": _TS,
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": _TS,
    },
    "events": {
        "event_id": "bigint",
        "ts": _TS,
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(spark, sf_dir, table):
    got = dict(tables.load(spark, sf_dir, table).dtypes)
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{table}: fixture columns drifted — have {sorted(got)}, "
        f"expected {sorted(want)}"
    )
    for col, dtype in want.items():
        allowed = dtype if isinstance(dtype, tuple) else (dtype,)
        assert got[col] in allowed, (
            f"{table}.{col}: fixture dtype drifted to {got[col]!r} "
            f"(expected one of {allowed}) — update oraaud_kafka_spark/"
            f"tables.py normalization before chasing downstream failures"
        )
