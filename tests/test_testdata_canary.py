"""Testdata-schema canary.

The round driver regenerates /root/testdata between rounds and has
already changed physical encodings once (round 4: events.ts went from
INT64 TIMESTAMP(NANOS) to timestamp[us], silently breaking every
event-time operator). This canary pins the dtype FAMILIES the code
handles per column, so the next regeneration fails ONE test with the
exact table/column/dtype instead of six cascading query errors.

If this test fails: the driver shipped a new encoding. Extend the
accepting loader (workload.load_events for events.ts) and then widen
the family set here.
"""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

#: column -> accepted pyarrow dtype families (prefix match).
#: families, not exact types: int32 vs int64 widths are absorbed by
#: Spark casts; what breaks code is a KIND change (int <-> timestamp
#: <-> string), which is exactly what this pins.
EXPECTED = {
    "events": {
        "event_id": ("int",),
        # both encodings the loader branches on (workload.load_events)
        "ts": ("timestamp", "int64"),
        "user_id": ("int",),
        "event_type": ("string", "large_string"),
        "value": ("double", "float"),
        "props": ("string", "large_string"),
    },
    "documents": {
        "doc_id": ("int",),
        "text": ("string", "large_string"),
        "lang": ("string", "large_string"),
        "source": ("string", "large_string"),
    },
    "embeddings": {
        "vec_id": ("int",),
        "embedding": ("list", "large_list", "fixed_size_list"),
        "label": ("int",),
    },
    "orders": {
        "o_orderkey": ("int",),
        "o_totalprice": ("double", "float"),
        # date-literal comparisons tolerate timestamp/date/string
        "o_orderdate": ("timestamp", "date", "string", "large_string"),
    },
    "lineitem": {
        "l_orderkey": ("int",),
        "l_quantity": ("double", "float"),
        "l_extendedprice": ("double", "float"),
        "l_discount": ("double", "float"),
        "l_shipdate": ("timestamp", "date", "string", "large_string"),
    },
    "customer": {"c_custkey": ("int",), "c_acctbal": ("double", "float")},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_dtype_families(table):
    schema = pq.read_schema(f"{SF_DIR}/{table}.parquet")
    for col, families in EXPECTED[table].items():
        assert col in schema.names, f"{table}.{col} missing from driver testdata"
        actual = str(schema.field(col).type)
        assert actual.startswith(families), (
            f"{table}.{col} is now {actual!r} (accepted families: {families}) — "
            f"the driver regenerated testdata with a NEW encoding; extend the "
            f"loader first (see workload.load_events for the events.ts pattern), "
            f"then widen this canary"
        )
