"""Property-based cross-check of THE load-bearing contract: the library
FNV-1a-64 (`functions/hashing.hash_strings`) must equal the DuckDB HUGEINT
replay (`__ray_entry__._fnv_tok_sql`) byte-for-byte on arbitrary ASCII
input — every hash-replay oracle (simhash, CMS, bloom, embed, LSH) leans
on this equality."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from graphlite_ray.functions.hashing import hash_strings


def _sql_hashes(tokens: list[str], prefix: int) -> np.ndarray:
    import __ray_entry__ as E

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"tok": tokens}))
    expr = E._fnv_tok_sql(prefix)
    # fetchall keeps HUGEINT as exact Python int; .df() would round-trip
    # through float64 and corrupt the low bits above 2^53.
    rows = con.execute(f"SELECT {expr} AS h FROM t").fetchall()
    return np.array([int(r[0]) for r in rows], dtype=np.uint64)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=5),
)
def test_fnv_matches_sql_replay(tokens, salt):
    py = hash_strings(tokens, salt=salt)
    sql = _sql_hashes(tokens, prefix=42 + salt)
    assert np.array_equal(py, sql), (tokens, salt)


def test_fnv_matches_sql_replay_unicode():
    toks = ["naïve", "中文", "🙂", "mixé"]
    assert np.array_equal(hash_strings(toks), _sql_hashes(toks, 42))
