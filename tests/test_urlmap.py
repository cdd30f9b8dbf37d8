"""url-map construction + id collision check (SURVEY.md §7.1 step 3)."""

import pyarrow as pa
import ray.data

from graphlite_ray.functions.hashing import ids_from_urls
from graphlite_ray.stages.extract import build_url_map, id_collision_check


def _edge_urls(pairs):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_url": pa.array([a for a, _ in pairs]),
                "dst_url": pa.array([b for _, b in pairs]),
            }
        )
    )


def test_build_url_map_covers_both_endpoints_exactly_once():
    pairs = [
        ("https://a.example/1", "https://a.example/2"),
        ("https://a.example/2", "https://a.example/3"),
        ("https://a.example/1", "https://a.example/3"),  # repeats collapse
    ]
    out = build_url_map(_edge_urls(pairs)).to_pandas()
    assert sorted(out["url"]) == [f"https://a.example/{i}" for i in (1, 2, 3)]
    assert len(out) == out["vertex_id"].nunique() == 3
    for _, row in out.iterrows():
        assert row["vertex_id"] == int(ids_from_urls([row["url"]])[0])


def test_id_collision_check_zero_on_distinct_urls():
    pairs = [(f"https://h.example/p{i}", f"https://h.example/p{i+1}") for i in range(200)]
    um = build_url_map(_edge_urls(pairs))
    assert id_collision_check(um) == 0
