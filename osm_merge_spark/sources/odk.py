"""ODK Central field-data ingest (S5): hierarchical submission columns →
flat (lon, lat, tags) POI features — the input path of POI conflation.

Reference: `osm_merge/fieldwork/parsers.py:88-214` (CSVparser: basename after
the last ``-``/``:``, warmup-location fallback, metadata-field ignore list,
per-field tag conversion) and the JSON/XML variants (`:196-320`) which
flatten nested groups the same way; dispatch `osm_merge/conflator.py:919-928`.

Spark-first shape: the hierarchy lives in COLUMN NAMES (CSV) or nested
struct SCHEMA (JSON), both known at plan time — so the flatten/rename/
coalesce work is a driver-side schema walk compiled into one narrow
projection.  No per-row Python anywhere; file parsing is Spark's native
CSV/JSON reader (splittable, predicate-pushdown-capable at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ODK Central submission metadata, never tags (`parsers.py` self.ignore /
# fieldwork/convert.py ignore list)
IGNORE = {
    "start", "end", "today", "deviceid", "phonenumber", "username", "email",
    "instanceid", "submissiondate", "key", "status", "reviewstate", "edits",
    "version", "attachmentspresent", "attachmentsexpected", "meta",
    "submitterid", "submittername", "formversion",
}

# `fieldwork/convert.py` convertEntry renames (the xforms.yaml core set)
TAG_RENAMES = {
    "xid": "ref",
    "comment": "note",
    "existing": "building",
    "cafe_type": "cuisine",
}


def basename(path: str) -> str:
    """`parsers.py:62-83`: the node name after the last ``-`` (ODK CSV) or
    ``:`` (XML namespace) separator, lowercased."""
    if "-" in path:
        return path.split("-")[-1].lower()
    if ":" in path:
        return path.split(":")[-1].lower()
    return path.lower()


def _flatten_schema(schema: T.StructType, prefix: str = "") -> list[str]:
    """Nested JSON groups → dotted column paths (driver-side walk)."""
    out: list[str] = []
    for f in schema.fields:
        path = f"{prefix}.`{f.name}`" if prefix else f"`{f.name}`"
        if isinstance(f.dataType, T.StructType):
            out.extend(_flatten_schema(f.dataType, path))
        else:
            out.append(path)
    return out


def odk_to_features(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """ODK-shaped frame (hierarchical column names and/or nested structs) →
    ``(lon double, lat double, tags map<string,string>)`` features.

    - latitude/longitude come from the location fields, falling back to the
      warmup location when the primary is missing (`parsers.py:124-141`);
    - metadata fields are dropped (ignore list);
    - everything else becomes a tag under its basename, with the
      convertEntry renames applied; empty values dropped (`parsers.py:115`).
    """
    # resolve nested structs first (JSON groups), then hierarchical names
    paths = _flatten_schema(df.schema)
    flat_cols: list[tuple[str, Column]] = []  # (hierarchy-joined name, col)
    for p in paths:
        name = "-".join(s.strip("`") for s in p.split("."))
        flat_cols.append((name, F.col(p)))

    lat_primary, lat_warm, lon_primary, lon_warm = [], [], [], []
    tag_entries: list[tuple[Column, Column]] = []
    keep: list[Column] = [F.col(id_col)] if id_col else []
    for name, col in flat_cols:
        base = basename(name)
        if id_col and name == id_col:
            continue
        if base in IGNORE:
            continue
        is_warm = "warmup" in name.lower()
        if base == "latitude":
            (lat_warm if is_warm else lat_primary).append(col.cast("double"))
            continue
        if base == "longitude":
            (lon_warm if is_warm else lon_primary).append(col.cast("double"))
            continue
        key = TAG_RENAMES.get(base, base)
        v = col.cast("string")
        tag_entries.append((F.lit(key), F.when(F.length(v) > 0, v)))

    lat = F.coalesce(*(lat_primary + lat_warm)) if (lat_primary or lat_warm) else F.lit(None).cast("double")
    lon = F.coalesce(*(lon_primary + lon_warm)) if (lon_primary or lon_warm) else F.lit(None).cast("double")
    pairs = F.array(*[F.struct(k.alias("key"), v.alias("value")) for k, v in tag_entries])
    tags = F.map_from_entries(F.filter(pairs, lambda e: e["value"].isNotNull()))
    return df.select(*keep, lon.alias("lon"), lat.alias("lat"), tags.alias("tags"))


def read_odk_csv(spark: SparkSession, path: str, id_col: str | None = None) -> DataFrame:
    """ODK Central CSV export → POI features (native splittable CSV scan)."""
    return odk_to_features(spark.read.option("header", True).csv(path), id_col=id_col)


def read_odk_json(spark: SparkSession, path: str, id_col: str | None = None) -> DataFrame:
    """ODK Central JSON export (nested groups) → POI features."""
    return odk_to_features(spark.read.option("multiLine", True).json(path), id_col=id_col)


# ---------------------------------------------------------------------------
# ODK XML Instance files (`parsers.py:287-358` XMLparser; dispatch
# `conflator.py:919-928`).  One small XML document per submission, copied off
# the phone — so the distributed unit is the FILE: a wholetext scan yields
# one row per instance, and parsing runs in an Arrow-batched mapInPandas
# kernel (stdlib ElementTree; xml is inherently per-document work, never
# row-at-a-time Python over fields).
# ---------------------------------------------------------------------------

# ODK geopoint value: "lat lon altitude accuracy".  The reference's detection
# regex (`parsers.py:320` — all four tokens `[0-9.]*`, i.e. OPTIONAL) matches
# any value containing three spaces and then crashes float() on non-numeric
# text; this engine requires four numeric tokens (documented deviation).
_GEOPOINT_RE = r"^-?[0-9.]+ -?[0-9.]+ -?[0-9.]+ -?[0-9.]+$"

_ODK_XML_SCHEMA = T.StructType(
    [
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _flatten_xml_element(elem, prefix: str = "") -> list[tuple[str, str]]:
    """Depth-first element flatten with ``:``-joined paths (the FlatDict
    shape the reference builds, `parsers.py:317`); attributes skipped
    (reference drops ``@``-keys, `parsers.py:322-323`); namespaces
    stripped."""
    out: list[tuple[str, str]] = []
    children = list(elem)
    if not children:
        if elem.text is not None and elem.text.strip():
            out.append((prefix, elem.text.strip()))
        return out
    for ch in children:
        tag = ch.tag.rsplit("}", 1)[-1]
        out.extend(_flatten_xml_element(ch, f"{prefix}:{tag}" if prefix else tag))
    return out


def parse_odk_xml_docs(docs) -> "pd.DataFrame":
    """Batch kernel: XML instance strings → (lon, lat, tags) rows.  Same
    downstream semantics as :func:`odk_to_features`: geopoint detection
    (``Point((gps[1], gps[0]))`` — lat first in the value, `parsers.py:331`),
    metadata ignore list, basename + convertEntry renames, last geopoint
    wins (reference overwrites ``geom`` per match)."""
    import re
    import xml.etree.ElementTree as ET

    import pandas as pd

    pat = re.compile(_GEOPOINT_RE)
    lons, lats, tag_maps = [], [], []
    for doc in docs:
        lon = lat = None
        tags: dict[str, str] = {}
        root = ET.fromstring(doc)
        if root.tag.rsplit("}", 1)[-1] != "data":
            data = root.find(".//data")
            root = data if data is not None else root
        for key, value in _flatten_xml_element(root):
            base = basename(key)
            if base in IGNORE:
                continue
            if pat.match(value):
                gps = value.split(" ")
                lat, lon = float(gps[0]), float(gps[1])
                continue
            if value:
                tags[TAG_RENAMES.get(base, base)] = value
        lons.append(lon)
        lats.append(lat)
        tag_maps.append(tags)
    return pd.DataFrame({"lon": lons, "lat": lats, "tags": tag_maps})


def odk_xml_to_features(df: DataFrame, xml_col: str = "value") -> DataFrame:
    """Frame of XML instance strings → POI features (mapInPandas kernel)."""

    def run(batches):
        for pdf in batches:
            yield parse_odk_xml_docs(pdf[xml_col])

    return df.mapInPandas(run, _ODK_XML_SCHEMA)


def read_odk_xml(spark: SparkSession, path: str) -> DataFrame:
    """ODK XML Instance ingest (S5 XML variant): one file per submission,
    wholetext scan (splittable ACROSS files — the per-file document is the
    atomic unit), Arrow-batched parse."""
    return odk_xml_to_features(spark.read.text(path, wholetext=True))
