"""Schema-map converter family: external agency schemas → OSM tag schema.

The reference implements one converter class per source, each driven by a
YAML mapping plus hand-written special cases:

- MVUM roads     `osm_merge/utilities/mvum.py:111-245`
- USFS trails    `osm_merge/utilities/trails.py:64-179`
- USGS topo      `osm_merge/utilities/usgs.py:72-258`
- BLM roads      `osm_merge/utilities/blm.py:104-243`
- NPS trails     `osm_merge/utilities/nps.py:65-106`
- county roads   `osm_merge/utilities/local_roads.py:89-182`
- OSM highways   `osm_merge/utilities/osmhighways.py:80-224`

Here the whole family is one engine: a :class:`ConverterSpec` declares
column→tag renames, value code tables, and post-rules; :func:`convert`
compiles the spec into a single narrow JVM-side projection (no shuffle, no
Python).  The MVUM-shaped spec below reproduces the reference's signature
transforms: code tables for smoothness/surface (`mvum.py:167-186`),
name title-casing + abbreviation expansion (`:150-166`), ref prefixing
(`:193-230`), seasonal/opening-hours (`:69-109`), and vehicle →
``*=designated`` access tags (trails.py semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tags as TG


@dataclass
class ConverterSpec:
    """Declarative external→OSM mapping (the YAML-config analog)."""

    # source column → OSM tag key, copied verbatim
    renames: dict[str, str] = field(default_factory=dict)
    # source column → (OSM tag key, {source code → OSM value})
    code_tables: dict[str, tuple[str, dict[str, str]]] = field(default_factory=dict)
    # constant tags stamped on every feature
    constants: dict[str, str] = field(default_factory=dict)
    # columns whose values feed normalize_name / normalize_ref / opening_hours
    name_col: str | None = None
    ref_col: str | None = None
    ref_prefix: str = "FR"
    season_col: str | None = None
    # vehicle-permission columns → access tags (value 'Y' → <tag>=designated)
    vehicle_cols: dict[str, str] = field(default_factory=dict)


# The MVUM-shaped spec (`mvum.yaml` + special cases in mvum.py)
MVUM_SPEC = ConverterSpec(
    renames={"gid": "ref:usfs:gid"},
    code_tables={
        "sur_code": (
            "surface",
            {"1": "dirt", "2": "gravel", "3": "paved", "4": "compacted", "5": "ground"},
        ),
        "smo_code": (
            "smoothness",
            {
                "1": "very_horrible",
                "2": "horrible",
                "3": "very_bad",
                "4": "bad",
                "5": "intermediate",
            },
        ),
        "hw_code": (
            "highway",
            {"RD": "track", "TR": "path", "HWY": "unclassified"},
        ),
    },
    constants={"operator": "US Forest Service"},
    name_col="name",
    ref_col="id",
    ref_prefix="FR",
    season_col="seasonal_dates",
    vehicle_cols={"atv": "atv", "motorcycle": "motorcycle", "highclearance": "4wd_only"},
)


def _code_map_expr(col: Column, table: dict[str, str]) -> Column:
    expr = F.lit(None).cast("string")
    for code, value in table.items():
        expr = F.when(col == code, F.lit(value)).otherwise(expr)
    return expr


def convert(df: DataFrame, spec: ConverterSpec, keep_cols: list[str] | None = None) -> DataFrame:
    """Compile the spec into one projection producing a ``tags`` map column.

    Null-valued entries are dropped (the reference emits only present tags).
    Entirely whole-stage-codegen; the converter is a zero-shuffle stage.
    """
    entries: list[tuple[Column, Column]] = []
    for src, tag_key in spec.renames.items():
        if src in df.columns:
            entries.append((F.lit(tag_key), F.col(src).cast("string")))
    for src, (tag_key, table) in spec.code_tables.items():
        if src in df.columns:
            entries.append((F.lit(tag_key), _code_map_expr(F.col(src).cast("string"), table)))
    for key, value in spec.constants.items():
        entries.append((F.lit(key), F.lit(value)))
    if spec.name_col and spec.name_col in df.columns:
        entries.append((F.lit("name"), TG.normalize_name(F.col(spec.name_col))))
    if spec.ref_col and spec.ref_col in df.columns:
        entries.append((F.lit("ref:usfs"), TG.normalize_ref(F.col(spec.ref_col), spec.ref_prefix)))
    if spec.season_col and spec.season_col in df.columns:
        entries.append((F.lit("opening_hours"), TG.opening_hours(F.col(spec.season_col))))
        entries.append((F.lit("seasonal"), TG.is_seasonal(F.col(spec.season_col))))
    for src, tag_key in spec.vehicle_cols.items():
        if src in df.columns:
            entries.append(
                (
                    F.lit(tag_key),
                    F.when(F.upper(F.col(src).cast("string")) == "Y", F.lit("designated")).otherwise(
                        F.lit(None).cast("string")
                    ),
                )
            )

    pairs = F.array(
        *[F.struct(k.alias("key"), v.alias("value")) for k, v in entries]
    )
    tags = F.map_from_entries(F.filter(pairs, lambda e: e["value"].isNotNull()))
    out_cols = keep_cols if keep_cols is not None else [c for c in ("geom", "ext_id", "way_id") if c in df.columns]
    return df.select(*out_cols, tags.alias("tags"))
