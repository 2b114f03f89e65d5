"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship conflation lifecycle over the interleaved spans
table at sf0.001; ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 with DuckDB-checkable oracles (see
``osm_merge_spark/queries.py`` for the registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: decode the interleaved
    spans table → conflate external ways into it → re-encode spans with
    debug tags appended (the full §3.1 lifecycle)."""
    from pyspark.sql import functions as F

    from osm_merge_spark.operators import conflate as C
    from osm_merge_spark.operators import spans as SP
    from osm_merge_spark.sources import synth

    sf_dir = "/root/testdata/sf0.001"
    docs = synth.documents_spans(spark, sf_dir)
    feats = SP.spans_to_features(docs)
    secondary = feats.select(
        F.regexp_replace("doc_id", "doc-", "").cast("bigint").alias("way_id"),
        "geom",
        "tags",
        F.lit(1).alias("version"),
        "doc_id",
        "spans",
    )
    primary = synth.external_ways(spark, sf_dir)
    conflated, _new = C.conflate(primary, secondary)
    # re-attach provenance spans and emit with debug tags appended
    out = conflated.join(secondary.select("way_id", "doc_id", "spans"), "way_id")
    return SP.features_to_spans(out, extra_tag_cols=["hits", "dist"]).join(
        out.select("doc_id", "ext_id", "way_id", "hits", "dist"), "doc_id"
    )


# ---------------------------------------------------------------------------
# Driver-row rotation (round 5 redesign): the driver's CORRECTNESS artifact
# records only the FIRST 50 registered queries, and the registry has grown
# past 50.  The ordering below is a MECHANICAL recency rule computed from the
# recorded artifacts themselves — no hand-picked name list (r4 ADVICE:
# submitter-curated sampling of the verification surface undermines the
# evidence).  Rule, applied over registration order:
#
#   1. queries with NO driver row in any recorded round, or whose LATEST
#      driver row is not green, come first (they need a fresh row);
#   2. the rest are ordered by ascending last-recorded round (least recently
#      recorded first), ties broken by registration order.
#
# The tail that falls outside the 50-row window is therefore always the
# most-recently-green set, and the window round-robins the whole registry
# across rounds: a query recorded green this round moves to the back next
# round and cycles in again as others get recorded.  tests/
# test_registry_rotation.py pins the invariants (every registry entry has a
# driver row in the union of recorded rounds or sits in the current window;
# every needs-a-row query is in-window; fail-loud if they can't all fit).
# Documented in README.md §Registry rotation.
# ---------------------------------------------------------------------------

_DRIVER_ROW_CAP = 50


def _driver_rows() -> dict[str, tuple[int, bool]]:
    """name → (last recorded round, was that row green).  Green = no error
    and none of rows/schema/hash compared false (None = the driver's weaker
    rows-only check for no-oracle queries — still a recorded row)."""
    import glob
    import json
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    rows: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, v in data.items():
            if not isinstance(v, dict):
                continue
            green = not v.get("err") and all(
                v.get(k) in (True, None)
                for k in ("rows_match", "schema_match", "hash_match")
            )
            prev = rows.get(name)
            if prev is None or rnd >= prev[0]:
                rows[name] = (rnd, green)
    return rows


def _rotated(names: list[str]) -> list[str]:
    try:
        rows = _driver_rows()
    except Exception:
        return list(names)  # artifacts unreadable → plain registration order

    def key(item: tuple[int, str]):
        i, n = item
        rec = rows.get(n)
        needs_row = rec is None or not rec[1]
        last_rnd = -1 if rec is None else rec[0]
        return (1 if not needs_row else 0, last_rnd, i)

    return [n for _, n in sorted(enumerate(names), key=lambda t: key(t))]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osm_merge_spark.queries import REGISTRY

    order = _rotated(list(REGISTRY))
    return {name: REGISTRY[name][0] for name in order}


def oracle_sql() -> dict[str, str]:
    from osm_merge_spark.queries import REGISTRY

    order = _rotated(list(REGISTRY))
    return {name: REGISTRY[name][1] for name in order if REGISTRY[name][1] is not None}
